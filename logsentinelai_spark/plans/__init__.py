from .audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_shuffle,
    assert_pushed_filter,
    assert_read_schema_only,
    explain_str,
)
