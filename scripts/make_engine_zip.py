"""Package logsentinelai_spark into engine.zip for spark-submit --py-files.

    python scripts/make_engine_zip.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "engine.zip"
    pkg = REPO / "logsentinelai_spark"
    with zipfile.ZipFile(out, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, arcname=str(p.relative_to(REPO)))
    print(out)


if __name__ == "__main__":
    main()
