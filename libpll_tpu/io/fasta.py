"""FASTA reading.

Capability parity with the reference's streaming FASTA reader (libpll
`src/fasta.c:24-324`): header lines start with '>', sequence characters are
classified by a validity map (legal / silently-stripped whitespace /
stripped-with-count / fatal), and iteration yields
``(header, sequence, stripped_count, sequence_number)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

from ..errors import FastaError, FileError
from .maps import pll_map_fasta


@dataclass
class FastaRecord:
    header: str
    sequence: str
    stripped: int
    seqno: int


class FastaReader:
    """Iterate records of a FASTA file (reference `pll_fasta_open/getnext`)."""

    def __init__(self, path: str, charmap: np.ndarray | None = None):
        self.path = path
        self.map = np.asarray(charmap if charmap is not None else
                              pll_map_fasta)
        try:
            with open(path, "rb") as fh:
                self._data = fh.read()
        except OSError as e:
            raise FileError(f"Unable to open file ({path})") from e
        self._lines = self._data.decode("latin-1").splitlines()
        if not any(ln.startswith(">") for ln in self._lines if ln.strip()):
            raise FastaError(f"Invalid FASTA format in {path}")

    def __iter__(self) -> Iterator[FastaRecord]:
        header = None
        chunks: List[str] = []
        stripped = 0
        seqno = 0
        for line in self._lines:
            if line.startswith(">"):
                if header is not None:
                    yield FastaRecord(header, "".join(chunks), stripped, seqno)
                    seqno += 1
                header = line[1:].strip()
                chunks = []
                stripped = 0
                continue
            if header is None:
                if line.strip():
                    raise FastaError("sequence data before first header")
                continue
            kept, s = _filter_sequence_line(line, self.map)
            chunks.append(kept)
            stripped += s
        if header is not None:
            yield FastaRecord(header, "".join(chunks), stripped, seqno)

    def read_all(self) -> Tuple[List[str], List[str]]:
        """Return (headers, sequences)."""
        # native C++ fast path (libpll_tpu.native.host.cpp): same validity
        # semantics (1 keep, 2 fatal, other stripped)
        from .. import native
        if native.available():
            try:
                headers, seqs, _ = native.fasta_scan(self._data, self.map)
                return headers, seqs
            except ValueError as e:
                raise FastaError(str(e)) from e
        headers, seqs = [], []
        for rec in self:
            headers.append(rec.header)
            seqs.append(rec.sequence)
        return headers, seqs


def _filter_sequence_line(line: str, charmap: np.ndarray) -> Tuple[str, int]:
    kept = []
    stripped = 0
    for ch in line:
        c = charmap[ord(ch) & 0xFF]
        if c == 1:
            kept.append(ch)
        elif c == 2:
            raise FastaError(f"Illegal character ({ch!r}) in FASTA sequence")
        elif c == 0:
            stripped += 1
        # c == 3: silently stripped whitespace
    return "".join(kept), stripped


def parse_fasta(path: str) -> Tuple[List[str], List[str]]:
    """Convenience: (headers, sequences) for a whole file."""
    return FastaReader(path).read_all()
