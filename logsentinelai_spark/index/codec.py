"""Posting-list physical format: docID-gap + varbyte, 128-posting blocks
with block-max annotations. Pure numpy, fully vectorized (no per-element
Python loops — the only loops are over the ≤10 byte positions of a
varbyte group), so it runs hot inside applyInPandas build/query UDFs.

Technique is public domain (vByte: Scholer et al./Anh-Moffat; block-max:
Ding & Suel SIGIR'11 "Faster top-k document retrieval using block-max
indexes"). LEB128-style LSB-first continuation-bit bytes.

Block row layout (one row per (term, block)) — written to parquet:
  term, block_id, n, first_doc, last_doc, max_tf, min_dl,
  gaps_vb, tfs_vb, dls_vb

``gaps_vb`` encodes [first_doc - base, then successive deltas] so
decode = base + cumsum. The block-max annotation is (max_tf, min_dl):
BM25's per-posting contribution tf/(tf + k1*(1-b+b*dl/avgdl)) is
increasing in tf and decreasing in dl, so
``idf * max_tf/(max_tf + k1*(1-b+b*min_dl/avgdl))`` is a valid block
upper bound computed AT QUERY TIME with the final (N, avgdl, df).
Storing raw (max_tf, min_dl) instead of a precomputed score keeps the
build single-pass and incremental: new waves shift avgdl without
invalidating previously written blocks, and salted partial runs never
need global stats.
"""

from __future__ import annotations

import numpy as np

from .bm25 import B, K1

BLOCK_SIZE = 128


def block_upper_bound(max_tf, min_dl, idf_t: float, avgdl: float):
    """Query-time block (or term) score upper bound; accepts scalars or
    numpy arrays."""
    mt = np.asarray(max_tf, dtype=np.float64)
    return idf_t * mt / (mt + K1 * (1 - B + B * np.asarray(min_dl, dtype=np.float64) / avgdl))

_THRESH = [1 << (7 * i) for i in range(1, 10)]


def vb_encode_with_lens(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte encode of a uint64 array. Returns
    (byte buffer, per-value byte lengths) so callers can slice the
    buffer at arbitrary value boundaries without re-encoding."""
    x = np.asarray(values, dtype=np.uint64)
    if x.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    lens = np.ones(x.size, dtype=np.int64)
    for t in _THRESH:
        lens += (x >= np.uint64(t)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    buf = np.zeros(int(lens.sum()), dtype=np.uint8)
    maxlen = int(lens.max())
    for i in range(maxlen):
        sel = lens > i
        b = (x[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = np.where(lens[sel] > i + 1, 0x80, 0).astype(np.uint8)
        buf[offsets[sel] + i] = b.astype(np.uint8) | cont
    return buf, lens


def vb_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    buf, _ = vb_encode_with_lens(values)
    return buf.tobytes()


def vb_decode(data: bytes | np.ndarray) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 128)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lens.max())):
        sel = lens > i
        vals[sel] |= (b[starts[sel] + i].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * i)
    return vals


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    base: int,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Split one term's doc-sorted postings into block rows.

    doc_ids must be strictly increasing (globally merged run);
    base = shard_base doc id (doc ids are absolute, gaps relative to base).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    out = []
    for bi, s in enumerate(range(0, n, block_size)):
        e = min(s + block_size, n)
        d = doc_ids[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = d[0] - base if s == 0 else d[0] - doc_ids[s - 1]
        gaps[1:] = np.diff(d).astype(np.uint64)
        out.append(
            {
                "block_id": bi,
                "n": int(e - s),
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(dls[s:e].min()),
                "gaps_vb": vb_encode(gaps),
                "tfs_vb": vb_encode(tfs[s:e].astype(np.uint64)),
                "dls_vb": vb_encode(dls[s:e].astype(np.uint64)),
            }
        )
    return out


def encode_blocks_grouped(
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_starts: np.ndarray,
    bases: np.ndarray,
    block_size: int = BLOCK_SIZE,
):
    """Encode posting blocks for MANY term groups in one vectorized pass.

    This is the hot path of the index build: a 10k-page Arrow batch
    yields ~10^5 (shard, term) groups, and calling :func:`encode_blocks`
    per group costs more in numpy call overhead than in work. Here the
    three varbyte streams are encoded over the WHOLE batch once, and the
    per-block binary cells are zero-copy slices of that single buffer
    (pyarrow BinaryArray built from offsets into it).

    Args:
      docs/tfs/dls: concatenated postings, doc-sorted within each group
        (groups contiguous, in group order).
      group_starts: int64 start index of each group (no end sentinel).
      bases: per-group shard base doc id (gap 0 is relative to it).

    Returns dict with per-block columns:
      gid (group index), block_id, n, first_doc, last_doc, max_tf,
      min_dl, and pyarrow BinaryArrays gaps_vb / tfs_vb / dls_vb;
      plus per-group ``group_sum_tf``.
    """
    import pyarrow as pa

    n = docs.size
    if n == 0:
        empty_b = pa.array([], type=pa.binary())
        z = np.empty(0, dtype=np.int64)
        return {
            "gid": z, "block_id": z, "n": z, "first_doc": z, "last_doc": z,
            "max_tf": z, "min_dl": z, "gaps_vb": empty_b, "tfs_vb": empty_b,
            "dls_vb": empty_b, "group_sum_tf": z,
        }
    group_starts = np.asarray(group_starts, dtype=np.int64)
    sizes = np.diff(np.append(group_starts, n))
    ngroups = group_starts.size
    pos = np.arange(n, dtype=np.int64) - np.repeat(group_starts, sizes)

    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = docs[1:] - docs[:-1]
    gaps[group_starts] = docs[group_starts] - np.asarray(bases, dtype=np.int64)

    block_starts = np.flatnonzero(pos % block_size == 0)
    boundaries = np.append(block_starts, n)
    block_ends = boundaries[1:]
    gid = np.repeat(np.arange(ngroups, dtype=np.int64), sizes)[block_starts]

    bufs = {}
    for name, arr in (("gaps_vb", gaps), ("tfs_vb", tfs), ("dls_vb", dls)):
        buf, lens = vb_encode_with_lens(arr.astype(np.uint64))
        cum = np.concatenate(([0], np.cumsum(lens)))
        # BinaryArray offsets are int32: a merge group whose encoded
        # stream exceeds 2 GiB would silently wrap and corrupt postings
        # (config-dependent: huge shard_size x tiny n_buckets). Fail loud.
        if cum[-1] >= 2**31:
            raise ValueError(
                f"encoded {name} stream is {int(cum[-1])} bytes >= 2 GiB; "
                "increase n_buckets (or lower shard_size) so each "
                "(shard, term_bucket) merge group stays under the int32 "
                "BinaryArray offset limit"
            )
        offsets = cum[boundaries]  # byte offset of each block boundary
        bufs[name] = pa.BinaryArray.from_buffers(
            pa.binary(), block_starts.size,
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
        )
    return {
        "gid": gid,
        "block_id": pos[block_starts] // block_size,
        "n": block_ends - block_starts,
        "first_doc": docs[block_starts],
        "last_doc": docs[block_ends - 1],
        "max_tf": np.maximum.reduceat(tfs, block_starts),
        "min_dl": np.minimum.reduceat(dls, block_starts),
        "group_sum_tf": np.add.reduceat(tfs, group_starts),
        **bufs,
    }


def decode_blocks(rows, base: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_blocks over an iterable of block rows (dicts or
    namedtuples with gaps_vb/tfs_vb/dls_vb, ordered by block_id).
    Returns (doc_ids, tfs, dls). Blocks chain: block b's first gap is
    relative to block b-1's last doc (or base for block 0)."""
    docs_parts, tf_parts, dl_parts = [], [], []
    prev = base
    for r in rows:
        g = vb_decode(_field(r, "gaps_vb")).astype(np.int64)
        d = np.cumsum(g) + prev
        prev = int(d[-1])
        docs_parts.append(d)
        tf_parts.append(vb_decode(_field(r, "tfs_vb")).astype(np.int64))
        dl_parts.append(vb_decode(_field(r, "dls_vb")).astype(np.int64))
    if not docs_parts:
        return (np.empty(0, np.int64),) * 3
    return np.concatenate(docs_parts), np.concatenate(tf_parts), np.concatenate(dl_parts)


def decode_single_block(r) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONE block independently (for WAND block skipping): uses the
    stored absolute first_doc instead of the gap chain."""
    g = vb_decode(_field(r, "gaps_vb")).astype(np.int64)
    d = np.cumsum(g) - g[0] + int(_field(r, "first_doc"))
    return (
        d,
        vb_decode(_field(r, "tfs_vb")).astype(np.int64),
        vb_decode(_field(r, "dls_vb")).astype(np.int64),
    )


def _field(r, name):
    if isinstance(r, dict):
        return r[name]
    return getattr(r, name)
