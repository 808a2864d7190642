"""Race/sanitizer coverage (SURVEY.md §5.2).

The host threading model is 'one mutating owner per batch': batch
i+1's alignment runs on a worker thread while batch i is paired and
emitted on the main thread, and inside a batch the seeding of chunk
i+1 overlaps chunk i's extension.  These tests perturb thread timing
with injected delays and assert byte-identical output — a data race
on the shared pipeline state would show up as record reordering or
corruption.  A second test runs the device path under JAX's debug_nans
sanitizer."""
import random
import time

import numpy as np
import pytest

import jax

import tpubwa.device  # noqa: F401
from tpubwa.cli import main_index
from tpubwa.device.pipeline import make_device_aligner
from tpubwa.host.pipeline import process_batches
from tpubwa.index import FMIndex
from tpubwa.io.fastq import Read
from tpubwa.opts import MEM_F_PE, MemOpt
from simread import simulate_pairs


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("race")
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    bases = "".join("ACGT"[c] for c in codes)
    fa = d / "ref.fa"
    fa.write_text(">r1\n" + "\n".join(
        bases[i:i + 70] for i in range(0, len(bases), 70)) + "\n")
    assert main_index([str(fa)]) == 0
    return codes, FMIndex.load(str(fa))


def _pe_batches(codes, rng, n_batches=3, pairs=10):
    code = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    batches = []
    for _ in range(n_batches):
        batch = []
        for name, s1, s2, *_ in simulate_pairs(codes, pairs, 100, rng):
            batch.append(Read(name=name, seq=np.array(
                [code[c] for c in s1], np.uint8), qual="I" * 100))
            batch.append(Read(name=name, seq=np.array(
                [code[c] for c in s2], np.uint8), qual="I" * 100))
        batches.append(batch)
    return batches


def test_pipeline_overlap_is_race_free(setup):
    """Random thread-timing perturbation in the overlapped stages must
    not change a single output byte across runs."""
    codes, fmi = setup
    opt = MemOpt(flag=MEM_F_PE)
    rng = np.random.default_rng(9)
    batches = _pe_batches(codes, rng)
    aligner = make_device_aligner(opt, fmi, platform="cpu")

    orig_seed = aligner._seed_chunk
    orig_regs = aligner._chunk_regs

    def run(delay_seed):
        jitter = random.Random(delay_seed)

        def slow_seed(chunk):
            time.sleep(jitter.random() * 0.05)
            return orig_seed(chunk)

        def slow_regs(*args):
            time.sleep(jitter.random() * 0.05)
            return orig_regs(*args)

        aligner._seed_chunk = slow_seed
        aligner._chunk_regs = slow_regs
        try:
            out = []
            for _, lines in process_batches(opt, fmi, iter(batches), 0,
                                            align_fn=aligner):
                out.extend(lines)
            return out
        finally:
            aligner._seed_chunk = orig_seed
            aligner._chunk_regs = orig_regs

    base = run(0)
    assert len(base) >= sum(len(b) for b in batches)
    for seed in (1, 2, 3):
        assert run(seed) == base, f"thread-timing seed {seed}"


def test_device_path_under_debug_nans(setup):
    """jax debug_nans sanitizer over the whole device pipeline: any
    NaN produced by a float op inside the jitted programs raises."""
    codes, fmi = setup
    opt = MemOpt(flag=MEM_F_PE)
    rng = np.random.default_rng(11)
    (batch,) = _pe_batches(codes, rng, n_batches=1, pairs=8)
    jax.config.update("jax_debug_nans", True)
    try:
        aligner = make_device_aligner(opt, fmi, platform="cpu")
        regs = aligner.align_batch(batch)
        assert sum(len(r) for r in regs) > 0
    finally:
        jax.config.update("jax_debug_nans", False)
