"""FASTQ/FASTA streaming (kseq.h/kopen.c equivalents; SURVEY.md §2
row 21).  Transparent gzip; batches sized by total bases like bwa's
chunk_size protocol (fastmap.c:~300: read ~chunk_size*n_threads bp per
pipeline step — chunk semantics affect PE insert stats, see §3.2)."""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import IO, Iterator, List, Optional, Tuple

import numpy as np

_NT4 = np.full(256, 4, dtype=np.uint8)
for _b, _c in zip(b"ACGTacgt", [0, 1, 2, 3, 0, 1, 2, 3]):
    _NT4[_b] = _c


@dataclass
class Read:
    name: str
    seq: np.ndarray          # uint8 codes 0..4
    qual: Optional[str]
    comment: str = ""

    @property
    def l_seq(self) -> int:
        return len(self.seq)


def _open(path: str) -> IO[bytes]:
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def encode_seq(seq: bytes) -> np.ndarray:
    return _NT4[np.frombuffer(seq, dtype=np.uint8)].copy()


class FastqReader:
    """Streaming FASTQ/FASTA parser (auto-detected per record)."""

    def __init__(self, path: str):
        self.fh = _open(path)
        self._peek: Optional[bytes] = None

    def close(self):
        self.fh.close()

    def _readline(self) -> bytes:
        if self._peek is not None:
            line, self._peek = self._peek, None
            return line
        return self.fh.readline()

    def _peekline(self) -> bytes:
        if self._peek is None:
            self._peek = self.fh.readline()
        return self._peek

    def __iter__(self) -> Iterator[Read]:
        return self

    def __next__(self) -> Read:
        while True:
            line = self._readline()
            if not line:
                raise StopIteration
            line = line.rstrip()
            if line:
                break
        if line.startswith(b"@"):  # FASTQ
            hdr = line[1:].split(None, 1)
            seq = self._readline().rstrip()
            plus = self._readline()
            qual = self._readline().rstrip()
            return Read(name=hdr[0].decode(), seq=encode_seq(seq),
                        qual=qual.decode() if qual else None,
                        comment=hdr[1].decode() if len(hdr) > 1 else "")
        if line.startswith(b">"):  # FASTA (multi-line)
            hdr = line[1:].split(None, 1)
            chunks: List[bytes] = []
            while True:
                nxt = self._peekline()
                if not nxt or nxt.startswith(b">") or nxt.startswith(b"@"):
                    break
                chunks.append(self._readline().rstrip())
            return Read(name=hdr[0].decode(),
                        seq=encode_seq(b"".join(chunks)), qual=None,
                        comment=hdr[1].decode() if len(hdr) > 1 else "")
        raise ValueError(f"malformed FASTQ/FASTA line: {line[:50]!r}")


def read_fastq_batch(readers: List[FastqReader], chunk_bases: int,
                     smart_pairing: bool = False) -> List[Read]:
    """bseq_read equivalent: pull reads until >= chunk_bases total bases.
    Two readers -> interleave mates; smart_pairing -> one reader supplies
    consecutive mate pairs (-p)."""
    out: List[Read] = []
    bases = 0
    if len(readers) == 2:
        it1, it2 = readers
        while bases < chunk_bases:
            try:
                r1 = next(it1)
            except StopIteration:
                break
            try:
                r2 = next(it2)
            except StopIteration:
                raise ValueError("paired FASTQ files have different length")
            out.extend([r1, r2])
            bases += r1.l_seq + r2.l_seq
        return out
    it = readers[0]
    while bases < chunk_bases:
        try:
            r = next(it)
        except StopIteration:
            break
        out.append(r)
        bases += r.l_seq
        if smart_pairing:  # always keep pairs together
            try:
                r2 = next(it)
            except StopIteration:
                break
            out.append(r2)
            bases += r2.l_seq
    return out
