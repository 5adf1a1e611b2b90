"""Regenerate the committed BPE merge table from the fixture corpus.

Usage:
  python scripts/learn_bpe.py [--corpus /root/testdata/sf0.01/documents.parquet]
      [--merges 60] [--out logsentinelai_spark/functions/bpe_merges.json]

Deterministic end-to-end (frequency-then-lexicographic tie-break, no
RNG), so re-running on the same corpus reproduces the artifact byte
for byte — the provenance block records what it was learned from.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from logsentinelai_spark.functions.bpe import learn_bpe  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--merges", type=int, default=20)
    ap.add_argument(
        "--out",
        default=str(Path(__file__).resolve().parent.parent
                    / "logsentinelai_spark" / "functions" / "bpe_merges.json"))
    args = ap.parse_args()

    import duckdb

    texts = [t for (t,) in duckdb.connect().execute(
        f"SELECT text FROM read_parquet('{args.corpus}') ORDER BY doc_id"
    ).fetchall()]
    model = learn_bpe(texts, n_merges=args.merges)
    model["provenance"] = {"corpus": args.corpus, "n_texts": len(texts)}
    Path(args.out).write_text(json.dumps(model, indent=1))
    print(f"wrote {args.out}: {model['n_merges']} merges from {len(texts)} docs")


if __name__ == "__main__":
    main()
