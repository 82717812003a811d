"""Exact k-mer seed hashing + extension (reference: kmer.py `KmerTable`;
SURVEY.md §2a — used by tsdFinder.py to find Target Site Duplication
pairs flanking candidate transposable elements).

Pure host-side string matching; windows are tiny (tens of bases) so no
device offload is warranted.
"""

from __future__ import annotations

from collections import defaultdict


class KmerTable:
    """Hash of all k-mers of a subject string -> start positions."""

    def __init__(self, subject: str, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        self.subject = subject
        self.k = k
        self._index: dict[str, list[int]] = defaultdict(list)
        for i in range(len(subject) - k + 1):
            mer = subject[i : i + k]
            if "N" not in mer:
                self._index[mer].append(i)

    def probe(self, query: str) -> list[tuple[int, int]]:
        """All (subject_pos, query_pos) seed hits of length k."""
        hits = []
        for j in range(len(query) - self.k + 1):
            mer = query[j : j + self.k]
            for i in self._index.get(mer, ()):
                hits.append((i, j))
        return hits

    def extend(
        self, query: str, subject_pos: int, query_pos: int
    ) -> tuple[int, int, int]:
        """Extend an exact seed match maximally in both directions.

        Returns (subject_start, query_start, length).
        """
        s, q = self.subject, query
        i, j = subject_pos, query_pos
        length = self.k
        while i > 0 and j > 0 and s[i - 1] == q[j - 1] and s[i - 1] != "N":
            i -= 1
            j -= 1
            length += 1
        while (
            i + length < len(s)
            and j + length < len(q)
            and s[i + length] == q[j + length]
            and s[i + length] != "N"
        ):
            length += 1
        return i, j, length

    def best_matches(self, query: str) -> list[tuple[int, int, int]]:
        """All maximal exact matches (deduplicated), longest first."""
        seen = set()
        out = []
        for sp, qp in self.probe(query):
            m = self.extend(query, sp, qp)
            if m not in seen:
                seen.add(m)
                out.append(m)
        out.sort(key=lambda m: (-m[2], m[0], m[1]))
        return out
