"""Repeat-realistic corpus e2e (round-2 verdict missing #3 / item 4):
the expensive paths of real data — max_occ subsampling, XA emission,
MAPQ=0 multimappers, satellite/segdup repeats, ALT contigs, N gaps —
exercised at chr-scale structure and pinned device == scalar."""
import io

import numpy as np
import pytest

from tpubwa.opts import MemOpt


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tpubwa.index import FMIndex
    from tpubwa.sim import make_bench_bnt, simulate_pe
    rng = np.random.default_rng(0xEA)
    bnt = make_bench_bnt(2_000_000, rng, realistic=True,
                         contig_bp=1_000_000)
    fmi = FMIndex.build(bnt)
    reads = simulate_pe(bnt, 120, 100, rng)
    return bnt, fmi, reads


def test_corpus_exercises_expensive_paths(corpus):
    """The generator must actually produce high-occ seeds and ALT/amb
    metadata — otherwise the bench rows measure nothing new."""
    bnt, fmi, reads = corpus
    from tpubwa.ref.smem import collect_intv
    opt = MemOpt()
    hi = 0
    for r in reads[:80]:
        sizes = [m.size for m in collect_intv(opt, fmi,
                                              np.asarray(r.seq))]
        hi += any(s > opt.split_width for s in sizes)
    assert hi >= 5, f"only {hi}/80 reads carry a high-occ seed"
    assert any(a.is_alt for a in bnt.anns)
    assert len(bnt.ambs) >= 2
    assert any(r.qual is not None for r in reads)


def test_realistic_device_equals_scalar_pe(corpus):
    """Full PE pipeline on the realistic corpus: device pipeline SAM ==
    scalar-oracle SAM (the repeat-heavy analogue of the uniform-genome
    equality tests)."""
    bnt, fmi, reads = corpus
    from tpubwa.device.pipeline import make_device_aligner
    from tpubwa.host.pipeline import process_seqs
    from tpubwa.opts import MEM_F_PE
    opt = MemOpt(flag=MEM_F_PE)
    aligner = make_device_aligner(opt, fmi, platform="cpu")
    sam_d = process_seqs(opt, fmi, reads, 0, align_fn=aligner)
    sam_s = process_seqs(opt, fmi, reads, 0)
    assert sam_d == sam_s
    # the corpus genuinely drives the multi-mapping machinery
    assert any("\tXA:Z:" in l for l in sam_d)
    assert any(l.split("\t")[4] == "0" for l in sam_d)   # MAPQ 0
    mapped = sum(1 for l in sam_d if not int(l.split("\t")[1]) & 4)
    assert mapped >= len(reads) * 0.95
