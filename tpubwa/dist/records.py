"""Record-range sharding for paired/gz FASTQ inputs (SURVEY.md §5.8).

Byte-range sharding (sharding.py) is fastest for one plain FASTQ, but
paired files need CONSISTENT record ranges across both mates and gz
streams can't seek.  This module shards by record index: shard i of N
owns records [i*n/N, (i+1)*n/N) where n is counted in one cheap
pre-pass — identical arithmetic on every host, no communication.
"""

from __future__ import annotations

import gzip
from typing import List

from ..io.fastq import FastqReader, Read


def count_records(path: str) -> int:
    """Number of FASTQ records (4-line records; FASTA counts '>')."""
    op = gzip.open if str(path).endswith(".gz") else open
    n_lines = 0
    fasta = None
    with op(path, "rb") as fh:
        first = fh.readline()
        if not first:
            return 0
        fasta = first.startswith(b">")
        if fasta:
            n = 1
            for line in fh:
                if line.startswith(b">"):
                    n += 1
            return n
        n_lines = 1
        for _ in fh:
            n_lines += 1
    return n_lines // 4


class ShardedReader:
    """Reads records [start, stop) of a FASTQ/FASTA file."""

    def __init__(self, path: str, start: int, stop: int):
        self.inner = FastqReader(path)
        self.stop = stop - start
        self.n = 0
        for _ in range(start):  # skip to the shard start
            try:
                next(self.inner)
            except StopIteration:
                break

    def __iter__(self):
        return self

    def __next__(self) -> Read:
        if self.n >= self.stop:
            raise StopIteration
        self.n += 1
        return next(self.inner)

    def close(self):
        self.inner.close()


def shard_readers(paths: List[str], shard_i: int,
                  shard_n: int) -> List[ShardedReader]:
    """Consistent record-range shard readers for 1 (SE/-p) or 2 (PE)
    files.  Pair counts are taken from the first file so both mates
    stay aligned."""
    if not (0 <= shard_i < shard_n):
        raise ValueError(f"bad shard {shard_i}/{shard_n}")
    n = count_records(paths[0])
    lo = n * shard_i // shard_n
    hi = n * (shard_i + 1) // shard_n
    readers = [ShardedReader(p, lo, hi) for p in paths]
    for r in readers:
        # global record offset: keeps mark_primary's hash_64 read ids
        # (and thus tie-breaking) identical to an unsharded run
        r.global_offset = lo * (2 if len(paths) == 2 else 1)
    return readers
