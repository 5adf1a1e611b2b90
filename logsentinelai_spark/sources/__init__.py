from .io import read_pages, read_table  # noqa: F401
