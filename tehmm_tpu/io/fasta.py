"""FASTA reading (reference: trackIO.py fasta branch; SURVEY.md §2a).

Per-base nucleotide symbols become a categorical track.  Sequences are
scanned once and offsets indexed, so fetching an interval of a large
genome does not hold every chromosome in memory at once.
"""

from __future__ import annotations


class FastaFile:
    """Random-access FASTA: index on first open, slice on demand."""

    def __init__(self, path: str):
        self.path = path
        # name -> (data_start_offset, seq_len, line_base_len, line_full_len)
        self._index: dict[str, tuple[int, int, int, int]] = {}
        self._build_index()

    def _build_index(self) -> None:
        with open(self.path, "rb") as fh:
            name = None
            data_start = 0
            seq_len = 0
            line_base = 0
            line_full = 0
            first_line = True
            pending_short = False  # a shorter line must be the LAST

            def commit():
                if name is not None:
                    self._index[name] = (
                        data_start, seq_len, line_base, line_full
                    )

            offset = 0
            for lineno, raw in enumerate(fh, 1):
                ll = len(raw)
                line = raw.rstrip(b"\r\n")
                if line.startswith(b">"):
                    commit()
                    name = line[1:].split()[0].decode()
                    data_start = offset + ll
                    seq_len = 0
                    line_base = 0
                    line_full = 0
                    first_line = True
                    pending_short = False
                elif not line and name is not None:
                    if seq_len == 0:
                        # blank line between header and sequence: shift
                        # the record's data start past it
                        data_start = offset + ll
                    else:
                        # a BLANK line inside a sequence body shifts
                        # the byte offsets exactly like a ragged line:
                        # fetch() would silently return wrong bases.
                        # Mark it like a short line — anything
                        # following in the same record is an error (a
                        # trailing blank line before the next header/
                        # EOF is harmless).
                        pending_short = True
                elif line:
                    # offset arithmetic in fetch() assumes every sequence
                    # line except the last has the first line's length —
                    # the samtools-faidx invariant.  Ragged interior lines
                    # would silently return WRONG bases, so reject them.
                    if pending_short:
                        raise ValueError(
                            f"{self.path}:{lineno}: ragged FASTA — "
                            f"sequence {name!r} has an interior line "
                            f"shorter than its first line ({line_base}); "
                            f"re-wrap the file to fixed-width lines"
                        )
                    if first_line:
                        line_base = len(line)
                        line_full = ll
                        first_line = False
                    elif len(line) < line_base:
                        pending_short = True
                    elif len(line) > line_base:
                        raise ValueError(
                            f"{self.path}:{lineno}: ragged FASTA — "
                            f"sequence {name!r} line is longer "
                            f"({len(line)}) than its first line "
                            f"({line_base}); re-wrap the file to "
                            f"fixed-width lines"
                        )
                    seq_len += len(line)
                offset += ll
            commit()

    @property
    def names(self) -> list[str]:
        return list(self._index)

    def length(self, name: str) -> int:
        return self._index[name][1]

    def fetch(self, name: str, start: int, end: int) -> str:
        """Subsequence [start, end), uppercased."""
        if name not in self._index:
            raise KeyError(f"sequence {name!r} not in {self.path}")
        data_start, seq_len, line_base, line_full = self._index[name]
        start = max(0, start)
        end = min(end, seq_len)
        if start >= end:
            return ""
        if line_base == 0:
            return ""
        byte_start = data_start + (start // line_base) * line_full + (
            start % line_base
        )
        byte_end = data_start + ((end - 1) // line_base) * line_full + (
            (end - 1) % line_base
        ) + 1
        with open(self.path, "rb") as fh:
            fh.seek(byte_start)
            chunk = fh.read(byte_end - byte_start)
        return chunk.replace(b"\n", b"").replace(b"\r", b"").decode().upper()
