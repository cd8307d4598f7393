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
    """Streaming FASTA reader (reference `pll_fasta_open/getnext/rewind/
    getfilesize/getfilepos/close`, src/pll.h:666-681): records are consumed
    one at a time with :meth:`getnext` (None at end of file — the
    counterpart of the reference's ``pll_errno == PLL_ERROR_FILE_EOF``
    convention), :meth:`rewind` restarts the stream, and
    :meth:`getfilepos` / :meth:`getfilesize` report byte progress through
    the file (the reference's use case: progress reporting while parsing
    large alignments)."""

    def __init__(self, path: str, charmap: np.ndarray | None = None):
        self.path = path
        self.map = np.asarray(charmap if charmap is not None else
                              pll_map_fasta)
        try:
            with open(path, "rb") as fh:
                self._data = fh.read()
        except OSError as e:
            raise FileError(f"Unable to open file ({path})") from e
        text = self._data.decode("latin-1")
        # line start offsets (byte == char offsets in latin-1)
        self._lines: List[str] = []
        self._offsets: List[int] = []
        pos = 0
        for line in text.splitlines(keepends=True):
            self._lines.append(line.rstrip("\r\n"))
            self._offsets.append(pos)
            pos += len(line)
        self._offsets.append(len(text))  # EOF sentinel
        if not any(ln.startswith(">") for ln in self._lines if ln.strip()):
            raise FastaError(f"Invalid FASTA format in {path}")
        self._cursor = 0
        self._seqno = 0
        self._closed = False

    # ------------------------------------------------------------------
    # streaming interface
    # ------------------------------------------------------------------
    def getnext(self) -> "FastaRecord | None":
        """Next record, or None at end of file."""
        if self._closed:
            raise FileError("FASTA reader is closed")
        n = len(self._lines)
        # skip blanks up to the next header
        while self._cursor < n and not self._lines[self._cursor].strip():
            self._cursor += 1
        if self._cursor >= n:
            return None
        line = self._lines[self._cursor]
        if not line.startswith(">"):
            raise FastaError("sequence data before first header")
        header = line[1:].strip()
        self._cursor += 1
        chunks: List[str] = []
        stripped = 0
        while self._cursor < n and not self._lines[self._cursor].startswith(">"):
            kept, s = _filter_sequence_line(self._lines[self._cursor],
                                            self.map)
            chunks.append(kept)
            stripped += s
            self._cursor += 1
        rec = FastaRecord(header, "".join(chunks), stripped, self._seqno)
        self._seqno += 1
        return rec

    def rewind(self) -> None:
        """Restart the stream (reference `pll_fasta_rewind`)."""
        self._cursor = 0
        self._seqno = 0

    def getfilesize(self) -> int:
        """Total file size in bytes (reference `pll_fasta_getfilesize`)."""
        return len(self._data)

    def getfilepos(self) -> int:
        """Byte offset of the read cursor (reference
        `pll_fasta_getfilepos`)."""
        return self._offsets[self._cursor]

    def close(self) -> None:
        """Release the buffer (reference `pll_fasta_close`)."""
        self._closed = True
        self._data = b""

    def __iter__(self) -> Iterator[FastaRecord]:
        self.rewind()
        while (rec := self.getnext()) is not None:
            yield rec

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
