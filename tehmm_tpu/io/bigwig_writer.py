"""Minimal BigWig writer (bedGraph sections, single R-tree leaf level).

The reference only *reads* BigWig, but this framework needs a writer to
(a) generate test fixtures without kent tools (none installed; zero
network) and (b) let users convert bedGraph/BED score tracks into the
binary format (the reference shells out to kent binaries for conversions,
SURVEY.md §2 [R?]).  Produces spec-compliant files readable by
io.bigwig.BigWigFile: v4 header, zlib-compressed bedGraph data sections,
chromosome B+ tree, one- or two-level R-tree, zero zoom levels (legal;
readers fall back to full-resolution data).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tehmm_tpu.io.bigwig import BIGWIG_MAGIC, CHROM_TREE_MAGIC, RTREE_MAGIC

_ITEMS_PER_SECTION = 1024


def write_bigwig(
    path: str,
    chrom_sizes: dict[str, int],
    entries: list[tuple[str, int, int, float]],
    compress: bool = True,
) -> None:
    """Write (chrom, start, end, value) runs as a BigWig file.

    Entries must be non-overlapping; they are sorted internally by
    (chrom-id, start).
    """
    chrom_ids = {name: i for i, name in enumerate(sorted(chrom_sizes))}
    entries = sorted(
        entries, key=lambda e: (chrom_ids[e[0]], int(e[1]))
    )

    # ---- build data sections (bedGraph encoding) ----
    sections = []  # (chrom_id, start, end, payload_bytes)
    i = 0
    while i < len(entries):
        cid = chrom_ids[entries[i][0]]
        group = []
        while (
            i < len(entries)
            and chrom_ids[entries[i][0]] == cid
            and len(group) < _ITEMS_PER_SECTION
        ):
            group.append(entries[i])
            i += 1
        s_start = int(group[0][1])
        s_end = int(max(g[2] for g in group))
        body = bytearray()
        body += struct.pack(
            "<IIIIIBBH", cid, s_start, s_end, 0, 0, 1, 0, len(group)
        )
        for _, gs, ge, gv in group:
            body += struct.pack("<IIf", int(gs), int(ge), float(gv))
        sections.append((cid, s_start, s_end, bytes(body)))

    max_raw = max((len(b) for *_x, b in sections), default=0)
    blobs = [
        zlib.compress(b) if compress else b for *_x, b in sections
    ]

    # ---- chromosome B+ tree ----
    # measured in BYTES: a non-ASCII name longer encoded than in
    # characters would overflow its fixed-size key slot and
    # misalign every following record
    key_size = max(
        (len(n.encode()) for n in chrom_sizes), default=1
    )
    chrom_tree = bytearray()
    chrom_tree += struct.pack(
        "<IIIIQQ", CHROM_TREE_MAGIC, 256, key_size, 8,
        len(chrom_sizes), 0,
    )
    chrom_tree += struct.pack("<BBH", 1, 0, len(chrom_sizes))
    for name in sorted(chrom_sizes):
        chrom_tree += name.encode().ljust(key_size, b"\0")
        chrom_tree += struct.pack("<II", chrom_ids[name], chrom_sizes[name])

    # ---- layout ----
    header_size = 64
    total_summary_offset = header_size
    summary_size = 40
    chrom_tree_offset = total_summary_offset + summary_size
    full_data_offset = chrom_tree_offset + len(chrom_tree)
    data_start = full_data_offset + 8  # u64 section count
    offsets = []
    pos = data_start
    for blob in blobs:
        offsets.append(pos)
        pos += len(blob)
    full_index_offset = pos

    # ---- R-tree (single leaf level; multiple leaves if > 256 blocks) ----
    rtree = bytearray()
    n = len(sections)
    if sections:
        min_cid = min(s[0] for s in sections)
        min_base = min(s[1] for s in sections if s[0] == min_cid)
        max_cid = max(s[0] for s in sections)
        max_base = max(s[2] for s in sections if s[0] == max_cid)
    else:
        min_cid = min_base = max_cid = max_base = 0
    rtree += struct.pack(
        "<IIQIIIIQII", RTREE_MAGIC, 256, n,
        min_cid, min_base, max_cid, max_base,
        full_index_offset, _ITEMS_PER_SECTION, 0,
    )
    # leaf node(s)
    if n <= 256:
        rtree += struct.pack("<BBH", 1, 0, n)
        for (cid, s, e, _), off, blob in zip(sections, offsets, blobs):
            rtree += struct.pack("<IIIIQQ", cid, s, cid, e, off, len(blob))
    else:
        # one internal root + ceil(n/256) leaves
        import math

        n_leaves = math.ceil(n / 256)
        root_size = 4 + 24 * n_leaves
        leaf_offsets = []
        leaf_blobs = []
        cursor = full_index_offset + 48 + root_size
        for li in range(n_leaves):
            chunk = list(range(li * 256, min((li + 1) * 256, n)))
            leaf = bytearray()
            leaf += struct.pack("<BBH", 1, 0, len(chunk))
            for idx in chunk:
                cid, s, e, _ = sections[idx]
                leaf += struct.pack(
                    "<IIIIQQ", cid, s, cid, e, offsets[idx],
                    len(blobs[idx]),
                )
            leaf_offsets.append(cursor)
            leaf_blobs.append(bytes(leaf))
            cursor += len(leaf)
        root = bytearray()
        root += struct.pack("<BBH", 0, 0, n_leaves)
        for li in range(n_leaves):
            chunk = list(range(li * 256, min((li + 1) * 256, n)))
            cid0, s0 = sections[chunk[0]][0], sections[chunk[0]][1]
            cid1 = sections[chunk[-1]][0]
            e1 = max(sections[c][2] for c in chunk)
            root += struct.pack(
                "<IIIIQ", cid0, s0, cid1, e1, leaf_offsets[li]
            )
        rtree += root
        for lb in leaf_blobs:
            rtree += lb

    # ---- total summary ----
    n_bases = sum(int(e[2]) - int(e[1]) for e in entries)
    vals = np.array([e[3] for e in entries], dtype=np.float64)
    lens = np.array(
        [int(e[2]) - int(e[1]) for e in entries], dtype=np.float64
    )
    if len(entries):
        summary = struct.pack(
            "<Qdddd", n_bases, float(vals.min()), float(vals.max()),
            float((vals * lens).sum()), float(((vals ** 2) * lens).sum()),
        )
    else:
        summary = struct.pack("<Qdddd", 0, 0.0, 0.0, 0.0, 0.0)

    # ---- header ----
    header = struct.pack(
        "<IHHQQQHHQQIQ",
        BIGWIG_MAGIC, 4, 0,
        chrom_tree_offset, full_data_offset, full_index_offset,
        0, 0, 0, total_summary_offset,
        (max_raw if compress else 0), 0,
    )

    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(summary)
        fh.write(bytes(chrom_tree))
        fh.write(struct.pack("<Q", len(sections)))
        for blob in blobs:
            fh.write(blob)
        fh.write(bytes(rtree))
