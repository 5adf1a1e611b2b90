"""Posting-list physical format: docID-gap compression, 128-posting
blocks with block-max annotations. Pure numpy, fully vectorized (no
per-element Python loops — the only loops are over the ≤10 byte
positions of a varbyte group or the ≤64 bit positions of a packed
width), so it runs hot inside applyInPandas build/query UDFs.

Two selectable block codecs (IndexConfig.codec, recorded in
_meta.json; readers dispatch on it):

  * ``varbyte`` (default) — LEB128-style LSB-first continuation-bit
    bytes (Scholer et al. SIGIR'02 / Anh-Moffat). Self-delimiting, so
    a term's concatenated block blobs decode in ONE vectorized pass.
  * ``packed`` — Lucene-style frame-of-reference bit packing: FULL
    blocks store [width byte b][block_size*b/8 packed bytes] with b =
    max bit length in the block; partial tail blocks fall back to
    varbyte behind a 0xFF marker byte (bit-packing a padded short
    block would waste b*(block_size-n) bits on the long tail of
    single-block terms). Cf. Lemire & Boytsov, "Decoding billions of
    integers per second through vectorization" (2015): fixed-width
    blocks decode branch-free; here decode batches all same-width
    blocks of a read into one unpackbits pass.

Block-max annotations (below) are codec-independent. Technique is
public domain (block-max: Ding & Suel SIGIR'11 "Faster top-k document
retrieval using block-max indexes").

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


# ------------------------------------------------------------- packed codec

PACKED_PARTIAL = 0xFF  # marker byte: varbyte-coded partial (tail) block

CODECS = ("varbyte", "packed")


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Exact per-element bit length of a uint64 array (0 -> 0), via a
    6-pass binary reduction — no float round-trip, valid to 2^64."""
    x = np.asarray(x, dtype=np.uint64)
    bl = np.zeros(x.size, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[x > 0] += 1
    return bl


def packed_encode_blocks(
    values: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[bytes]:
    """Encode MANY blocks with the packed codec in width-grouped
    vectorized passes. Returns one blob per block, in block order.

    Full blocks (n == block_size): [b][block_size*b/8 bytes], all
    blocks of one width b packed by a single np.packbits over the
    stacked (m, block_size, b) bit tensor (block_size % 8 == 0 keeps
    every block byte-aligned, asserted below). Zero-width full blocks
    (all values 0) are [0][n]. Partial blocks: [0xFF][varbyte bytes],
    varbyte-encoded for ALL partials in one vectorized pass and sliced
    per block. The per-blob Python is one bytes-assembly per BLOCK
    (n/block_size of the postings), never per posting."""
    if block_size % 8:
        raise ValueError(
            f"packed codec requires block_size % 8 == 0, got {block_size}")
    if block_size > 0xFFFF:
        # the zero-width full-block header stores the count in 2
        # little-endian bytes — a larger block would silently truncate
        # on decode, so refuse at encode time like the %8 guard above
        raise ValueError(
            f"packed codec requires block_size <= 65535, got {block_size}")
    vals = np.asarray(values, dtype=np.uint64)
    block_starts = np.asarray(block_starts, dtype=np.int64)
    block_ends = np.asarray(block_ends, dtype=np.int64)
    nblk = block_starts.size
    blobs: list[bytes] = [b""] * nblk
    if nblk == 0:
        return blobs
    sizes = block_ends - block_starts
    bl = _bitlen(vals)
    width = np.maximum.reduceat(bl, block_starts)
    width[sizes == 0] = 0
    full = sizes == block_size

    CHUNK = 1 << 15  # bound the transient bit tensor to ~block_size*64*32k
    for w in np.unique(width[full]) if full.any() else []:
        idx = np.flatnonzero(full & (width == w))
        w = int(w)
        if w == 0:
            # zero-width (all values 0): no payload, so carry n as a
            # 2-byte little-endian count
            hdr = bytes([0, block_size & 0xFF, block_size >> 8])
            for i in idx:
                blobs[i] = hdr
            continue
        hdr = bytes([w])
        for c0 in range(0, idx.size, CHUNK):
            ci = idx[c0:c0 + CHUNK]
            gather = (block_starts[ci][:, None]
                      + np.arange(block_size, dtype=np.int64)).ravel()
            m = vals[gather].reshape(ci.size, block_size)
            bits = ((m[:, :, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
            packed = np.packbits(
                bits.reshape(ci.size, block_size * w), axis=1, bitorder="little")
            for row, i in enumerate(ci):
                blobs[i] = hdr + packed[row].tobytes()
    pidx = np.flatnonzero(~full)
    if pidx.size:
        pvals = (
            np.concatenate([vals[block_starts[i]:block_ends[i]] for i in pidx])
            if pidx.size else np.empty(0, dtype=np.uint64)
        )
        buf, lens = vb_encode_with_lens(pvals)
        cum = np.concatenate(([0], np.cumsum(lens)))
        vstarts = np.concatenate(([0], np.cumsum(sizes[pidx])))
        bts = buf.tobytes()
        for k, i in enumerate(pidx):
            blobs[i] = b"\xff" + bts[cum[vstarts[k]]:cum[vstarts[k + 1]]]
    return blobs


def packed_decode_many(blobs) -> np.ndarray:
    """Decode a sequence of packed blobs -> concatenated uint64 values
    in blob order. All full blocks of one width decode in ONE
    unpackbits pass (the packed codec's point: branch-free, batched);
    Python touches each BLOB once, never a posting."""
    blobs = list(blobs)
    nb = len(blobs)
    if nb == 0:
        return np.empty(0, dtype=np.uint64)
    headers = np.empty(nb, dtype=np.int64)
    sizes = np.empty(nb, dtype=np.int64)
    partials: dict[int, np.ndarray] = {}
    for i, bl in enumerate(blobs):
        h = bl[0]
        headers[i] = h
        if h == PACKED_PARTIAL:
            v = vb_decode(memoryview(bl)[1:])
            partials[i] = v
            sizes[i] = v.size
        elif h == 0:
            sizes[i] = bl[1] | (bl[2] << 8)
        else:
            sizes[i] = (len(bl) - 1) * 8 // h
    offs = np.concatenate(([0], np.cumsum(sizes)))
    out = np.zeros(offs[-1], dtype=np.uint64)
    for w in np.unique(headers):
        w = int(w)
        if w in (0, PACKED_PARTIAL):
            continue
        idx = np.flatnonzero(headers == w)
        payload = b"".join(blobs[i][1:] for i in idx)
        bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
        m = bits.reshape(-1, w)
        v = np.zeros(m.shape[0], dtype=np.uint64)
        for k in range(w):
            v |= m[:, k].astype(np.uint64) << np.uint64(k)
        vstarts = np.concatenate(([0], np.cumsum(sizes[idx])))
        for k, i in enumerate(idx):
            out[offs[i]:offs[i + 1]] = v[vstarts[k]:vstarts[k + 1]]
    for i, v in partials.items():
        out[offs[i]:offs[i + 1]] = v
    return out


def decode_stream(blobs, codec: str = "varbyte") -> np.ndarray:
    """Decode a sequence of block blobs (one term's blocks, in block
    order) -> concatenated uint64 values. varbyte blobs are
    self-delimiting, so the whole stream decodes as one concatenated
    buffer; packed blobs dispatch through packed_decode_many."""
    if codec == "varbyte":
        return vb_decode(b"".join(blobs))
    if codec == "packed":
        return packed_decode_many(blobs)
    raise ValueError(f"unknown codec {codec!r}")


def decode_values(blob, codec: str = "varbyte") -> np.ndarray:
    """Decode ONE block's blob."""
    if codec == "varbyte":
        return vb_decode(blob)
    if codec == "packed":
        return packed_decode_many([blob])
    raise ValueError(f"unknown codec {codec!r}")


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    base: int,
    block_size: int = BLOCK_SIZE,
    codec: str = "varbyte",
) -> list[dict]:
    """Split one term's doc-sorted postings into block rows.

    doc_ids must be strictly increasing (globally merged run);
    base = shard_base doc id (doc ids are absolute, gaps relative to base).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = doc_ids[0] - base
        gaps[1:] = np.diff(doc_ids).astype(np.uint64)
    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)
    if codec == "packed":
        streams = {
            name: packed_encode_blocks(arr, starts, ends, block_size)
            for name, arr in (
                ("gaps_vb", gaps), ("tfs_vb", tfs.astype(np.uint64)),
                ("dls_vb", dls.astype(np.uint64)))
        }
    else:
        streams = {
            name: [vb_encode(arr[s:e]) for s, e in zip(starts, ends)]
            for name, arr in (
                ("gaps_vb", gaps), ("tfs_vb", tfs.astype(np.uint64)),
                ("dls_vb", dls.astype(np.uint64)))
        }
    out = []
    for bi, (s, e) in enumerate(zip(starts, ends)):
        d = doc_ids[s:e]
        out.append(
            {
                "block_id": bi,
                "n": int(e - s),
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(dls[s:e].min()),
                "gaps_vb": streams["gaps_vb"][bi],
                "tfs_vb": streams["tfs_vb"][bi],
                "dls_vb": streams["dls_vb"][bi],
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
    codec: str = "varbyte",
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
    if codec == "packed":
        for name, arr in (("gaps_vb", gaps), ("tfs_vb", tfs), ("dls_vb", dls)):
            blobs = packed_encode_blocks(
                arr.astype(np.uint64), block_starts, block_ends, block_size)
            bufs[name] = pa.array(blobs, type=pa.binary())
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


def decode_blocks(rows, base: int, codec: str = "varbyte") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_blocks over an iterable of block rows (dicts or
    namedtuples with gaps_vb/tfs_vb/dls_vb, ordered by block_id).
    Returns (doc_ids, tfs, dls). Blocks chain: block b's first gap is
    relative to block b-1's last doc (or base for block 0)."""
    docs_parts, tf_parts, dl_parts = [], [], []
    prev = base
    for r in rows:
        g = decode_values(_field(r, "gaps_vb"), codec).astype(np.int64)
        d = np.cumsum(g) + prev
        prev = int(d[-1])
        docs_parts.append(d)
        tf_parts.append(decode_values(_field(r, "tfs_vb"), codec).astype(np.int64))
        dl_parts.append(decode_values(_field(r, "dls_vb"), codec).astype(np.int64))
    if not docs_parts:
        return (np.empty(0, np.int64),) * 3
    return np.concatenate(docs_parts), np.concatenate(tf_parts), np.concatenate(dl_parts)


def decode_single_block(r, codec: str = "varbyte") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONE block independently (for WAND block skipping): uses the
    stored absolute first_doc instead of the gap chain."""
    g = decode_values(_field(r, "gaps_vb"), codec).astype(np.int64)
    d = np.cumsum(g) - g[0] + int(_field(r, "first_doc"))
    return (
        d,
        decode_values(_field(r, "tfs_vb"), codec).astype(np.int64),
        decode_values(_field(r, "dls_vb"), codec).astype(np.int64),
    )


def _field(r, name):
    if isinstance(r, dict):
        return r[name]
    return getattr(r, name)


# --------------------------------------------------------- positions (phrase)

# Positional postings (Lucene .prx-style, public format family): for
# each posting (doc, term) the token positions of the term in the doc,
# delta-coded PER POSTING (first value absolute, then gaps — entries
# are self-contained, so doc-disjoint runs merge by pure slice
# reordering, no chain re-basing). Positions are always varbyte
# regardless of the segment codec: position streams are long and
# low-value-per-byte, and the FoR block win measured negative for them
# (cf. BENCH/BASELINE.md codec section for the doc-gap case).


def encode_pos_blocks(pa, deltas: np.ndarray, entry_sizes: np.ndarray,
                      block_ns: np.ndarray):
    """One varbyte blob per block row over the ordered per-entry
    position-delta stream. ``entry_sizes`` are the value counts of the
    ordered entries (= tf per posting); block b owns the contiguous
    entry slice [cum(block_ns)[b], cum(block_ns)[b+1]) — exactly how
    encode_blocks_grouped tiles ordered postings into blocks. Returns
    a zero-copy pyarrow BinaryArray."""
    buf, lens = vb_encode_with_lens(np.asarray(deltas, dtype=np.uint64))
    val_cum = np.concatenate(([0], np.cumsum(entry_sizes)))
    ent_bnd = np.concatenate(([0], np.cumsum(block_ns)))
    byte_cum = np.concatenate(([0], np.cumsum(lens)))
    offsets = byte_cum[val_cum[ent_bnd]]
    if offsets.size and offsets[-1] >= 2**31:
        raise ValueError(
            "encoded position stream >= 2 GiB in one group; raise "
            "n_buckets (same bound as the posting streams)")
    return pa.BinaryArray.from_buffers(
        pa.binary(), int(block_ns.size),
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
         pa.py_buffer(buf.tobytes())],
    )


def decode_positions(blobs, tfs: np.ndarray) -> np.ndarray:
    """Decode concatenated pos_vb blobs (block rows in block order)
    back to ABSOLUTE positions, aligned with the posting value stream:
    posting k owns tfs[k] consecutive values. Vectorized segmented
    cumsum (no per-posting loop)."""
    deltas = vb_decode(b"".join(blobs)).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.cumsum(tfs) - tfs
    prefix = np.concatenate(([0], np.cumsum(deltas)))
    return np.cumsum(deltas) - np.repeat(prefix[starts], tfs)


def gather_entry_slices(values: np.ndarray, entry_starts: np.ndarray,
                        entry_sizes: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Concatenate per-entry slices of ``values`` in ``order`` order —
    the position-stream companion of a posting reorder (one gather, no
    Python loop)."""
    sel_starts = entry_starts[order]
    sel_sizes = entry_sizes[order]
    total = int(sel_sizes.sum())
    out_off = np.cumsum(sel_sizes) - sel_sizes
    idx = np.repeat(sel_starts - out_off, sel_sizes) + np.arange(total, dtype=np.int64)
    return values[idx]
