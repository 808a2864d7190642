"""wgsim-style read simulator for tests: samples reads from a genome
with SNPs/indels, records truth in the read name."""
import numpy as np

BASES = "ACGT"


def revcomp_codes(c):
    return (3 - c)[::-1].copy()


def simulate_reads(codes, n_reads, read_len, rng, snp_rate=0.01,
                   indel_rate=0.002, prefix="r"):
    """Returns list of (name, seq_str, true_pos, strand)."""
    out = []
    L = len(codes)
    for i in range(n_reads):
        pos = int(rng.integers(0, L - read_len - 10))
        frag = codes[pos:pos + read_len + 8].copy()
        # mutations
        j = 0
        read = []
        while len(read) < read_len and j < len(frag):
            r = rng.random()
            if r < indel_rate / 2:          # deletion in read
                j += 1
                continue
            if r < indel_rate:               # insertion in read
                read.append(int(rng.integers(0, 4)))
                continue
            b = int(frag[j])
            if rng.random() < snp_rate:
                b = (b + int(rng.integers(1, 4))) % 4
            read.append(b)
            j += 1
        seq = np.array(read[:read_len], dtype=np.uint8)
        strand = int(rng.integers(0, 2))
        if strand:
            seq = revcomp_codes(seq)
        name = f"{prefix}{i}_{pos}_{strand}"
        out.append((name, "".join(BASES[c] for c in seq), pos, strand))
    return out


def simulate_pairs(codes, n_pairs, read_len, rng, insert_mean=350,
                   insert_std=30, snp_rate=0.01, prefix="p"):
    """FR paired-end reads; truth in name: name_pos1_pos2."""
    out = []
    L = len(codes)
    for i in range(n_pairs):
        isize = max(int(rng.normal(insert_mean, insert_std)),
                    read_len * 2 + 10)
        pos = int(rng.integers(0, L - isize - 5))
        frag = codes[pos:pos + isize]
        r1 = frag[:read_len].copy()
        r2 = revcomp_codes(frag[-read_len:].copy())
        for r in (r1, r2):
            mut = rng.random(read_len) < snp_rate
            r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        name = f"{prefix}{i}_{pos}_{pos + isize - read_len}"
        out.append((name,
                    "".join(BASES[c] for c in r1),
                    "".join(BASES[c] for c in r2),
                    pos, pos + isize - read_len))
    return out


def write_fastq(path, reads):
    with open(path, "w") as fh:
        for name, seq, *_ in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
