"""Mode-matrix equality pins (VERDICT round-3 item 8).

The coverage holes named in the round-3 verdict: `-t > 1` (native
seeding + SA walk threaded) was never equality-tested, and mesh mode
forces megaq seeding so mesh x host/hybrid and mesh x forced-Python
fallbacks (TPUBWA_NO_NATIVE under GSPMD) were untested by
construction.  Each test pins one combination byte-for-byte against
the default path on the same input.
"""
import contextlib
import io
import os

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tpubwa.cli import main_index, main_mem
from tpubwa.device.pipeline import make_device_aligner
from tpubwa.host.pipeline import process_seqs
from tpubwa.index import FMIndex
from tpubwa.io.fastq import Read
from tpubwa.opts import MEM_F_PE, MemOpt
from simread import simulate_pairs, simulate_reads, write_fastq


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(0x31337)
    d = tmp_path_factory.mktemp("matrix")
    unit = rng.integers(0, 4, 35).astype(np.uint8)
    codes = np.concatenate([
        rng.integers(0, 4, 14000).astype(np.uint8), np.tile(unit, 4),
        rng.integers(0, 4, 9000).astype(np.uint8)])
    bases = "".join("ACGT"[c] for c in codes)
    fa = d / "ref.fa"
    fa.write_text(">mx1\n" + "\n".join(
        bases[i:i + 70] for i in range(0, len(bases), 70)) + "\n")
    assert main_index([str(fa)]) == 0
    se = simulate_reads(codes, 70, 100, rng, snp_rate=0.01,
                        indel_rate=0.004)
    pe = simulate_pairs(codes, 50, 100, rng, snp_rate=0.01)
    fq_se = str(d / "se.fq")
    write_fastq(fq_se, se)
    fq1, fq2 = str(d / "p1.fq"), str(d / "p2.fq")
    write_fastq(fq1, [(n, s1, p, q) for n, s1, s2, p, q in pe])
    write_fastq(fq2, [(n, s2, p, q) for n, s1, s2, p, q in pe])
    return str(fa), codes, fq_se, fq1, fq2


def _mem(prefix, fqs, extra=None):
    out = io.StringIO()
    assert main_mem(["--device", "cpu"] + (extra or [])
                    + [prefix] + fqs, out=out) == 0
    return [l for l in out.getvalue().splitlines()
            if not l.startswith("@PG")]


@contextlib.contextmanager
def _native_disabled():
    """Set TPUBWA_NO_NATIVE and reset every module-level lib cache so
    the switch actually takes effect mid-process (each bridge caches
    its dlopen in a module global)."""
    import tpubwa.host.native_emit as ne
    import tpubwa.host.native_smem as ns
    import tpubwa.ref.ksw as rk
    saved = (os.environ.get("TPUBWA_NO_NATIVE"), ne._LIB, ns._LIB,
             rk._NATIVE)
    os.environ["TPUBWA_NO_NATIVE"] = "1"
    ne._LIB = ns._LIB = None
    rk._NATIVE = None
    try:
        yield
    finally:
        if saved[0] is None:
            os.environ.pop("TPUBWA_NO_NATIVE", None)
        else:
            os.environ["TPUBWA_NO_NATIVE"] = saved[0]
        ne._LIB, ns._LIB, rk._NATIVE = saved[1], saved[2], saved[3]


# ------------------------------------------------------- threads > 1
def test_threads4_byte_identical_se_pe(corpus):
    """-t 4 drives the native seeder and SA walk across 4 threads
    (kthread.c:kt_for parity claim, SURVEY.md §2 row 19); output must
    be byte-identical to -t 1 on the same single chunk."""
    prefix, _codes, fq_se, fq1, fq2 = corpus
    se_1 = _mem(prefix, [fq_se], ["-t", "1"])
    se_4 = _mem(prefix, [fq_se], ["-t", "4"])
    assert se_4 == se_1
    pe_1 = _mem(prefix, [fq1, fq2], ["-t", "1"])
    pe_4 = _mem(prefix, [fq1, fq2], ["-t", "4"])
    assert pe_4 == pe_1


def test_threads4_no_native_byte_identical(corpus):
    """-t 4 with the native layer disabled entirely (pure-Python
    fallbacks must ignore the thread knob, not crash or reorder)."""
    prefix, _codes, fq_se, _fq1, _fq2 = corpus
    se_1 = _mem(prefix, [fq_se], ["-t", "1"])
    with _native_disabled():
        se_4 = _mem(prefix, [fq_se], ["-t", "4"])
    assert se_4 == se_1


# --------------------------------------------------- mesh x fallback
def _pe_reads(codes, n_pairs, rng):
    sim = simulate_pairs(codes, n_pairs, 100, rng)
    code = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    reads = []
    for name, s1, s2, *_ in sim:
        for s in (s1, s2):
            reads.append(Read(name=name, seq=np.array(
                [code[c] for c in s], np.uint8), qual="I" * len(s)))
    return reads


@pytest.fixture(scope="module")
def mesh_setup(corpus):
    assert len(jax.devices()) == 8, "conftest must provide 8 devices"
    prefix, codes, *_ = corpus
    fmi = FMIndex.load(prefix)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    rng = np.random.default_rng(7)
    reads = _pe_reads(codes, 36, rng)
    opt = MemOpt(flag=MEM_F_PE)
    single = make_device_aligner(opt, fmi, platform="cpu")
    sam_ref = process_seqs(opt, fmi, reads, 0, align_fn=single)
    return fmi, mesh, reads, opt, sam_ref


def test_mesh_no_native_equals_single(mesh_setup, monkeypatch):
    """Mesh (GSPMD) with every native fallback forced to Python: the
    megaq machine's spill/tail/oversize lanes must degrade to the
    PYTHON scalar paths under a mesh and still match the default
    single-device output byte-for-byte."""
    fmi, mesh, reads, opt, sam_ref = mesh_setup
    with _native_disabled():
        multi = make_device_aligner(opt, fmi, mesh=mesh)
        sam_m = process_seqs(opt, fmi, reads, 0, align_fn=multi)
    assert sam_m == sam_ref


@pytest.mark.parametrize("mode", ["host", "hybrid"])
def test_mesh_seed_mode_override_equals_single(mesh_setup,
                                               monkeypatch, mode):
    """Mesh mode defaults to megaq seeding (one host core cannot feed
    N chips) but TPUBWA_SEED_MODE overrides it; the host and hybrid
    seeding modes must produce identical SAM under a mesh too (the
    mesh x seed-mode interaction the round-3 verdict flagged as
    untested by construction)."""
    fmi, mesh, reads, opt, sam_ref = mesh_setup
    monkeypatch.setenv("TPUBWA_SEED_MODE", mode)
    multi = make_device_aligner(opt, fmi, mesh=mesh)
    assert multi.seed_mode == mode
    sam_m = process_seqs(opt, fmi, reads, 0, align_fn=multi)
    assert sam_m == sam_ref
