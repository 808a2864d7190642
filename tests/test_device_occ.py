"""Device occ/SA primitives vs the scalar FMIndex oracle."""
import numpy as np
import pytest

import tpubwa.device  # enables x64
import jax.numpy as jnp

from tpubwa.index import FMIndex
from tpubwa.device.occ import (DeviceIndex, bwt_code, bwt_extend, occ4,
                               sa_lookup, set_intv, get_ref_batch)
from tpubwa.ref.smem import BwtIntv
from tpubwa.ref.smem import bwt_extend as ref_extend
from tpubwa.ref.smem import set_intv as ref_set_intv


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, 3000).astype(np.uint8)
    p = tmp_path_factory.mktemp("docc") / "g.fa"
    p.write_text(">g\n" + "".join("ACGT"[c] for c in codes) + "\n")
    fmi = FMIndex.from_fasta(str(p))
    return fmi, DeviceIndex.from_fmindex(fmi)


def test_occ4_matches_scalar(setup):
    fmi, didx = setup
    rng = np.random.default_rng(0)
    ks = np.concatenate([
        np.array([-1, 0, 1, 127, 128, fmi.primary - 1, fmi.primary,
                  fmi.primary + 1, fmi.seq_len - 1, fmi.seq_len]),
        rng.integers(-1, fmi.seq_len + 1, 500)]).astype(np.int64)
    got = np.asarray(occ4(didx, jnp.asarray(ks)))
    for i, k in enumerate(ks):
        want = fmi.occ4(int(k))
        assert np.array_equal(got[i], want), (k, got[i], want)


def test_bwt_code_matches(setup):
    fmi, didx = setup
    xs = np.random.default_rng(1).integers(0, fmi.seq_len, 300)
    got = np.asarray(bwt_code(didx, jnp.asarray(xs)))
    for i, x in enumerate(xs):
        assert got[i] == fmi.bwt_code(int(x))


def test_extend_matches_scalar(setup):
    fmi, didx = setup
    rng = np.random.default_rng(2)
    # start from single-base intervals and random extensions
    iks = []
    for _ in range(50):
        c = int(rng.integers(0, 4))
        ik = ref_set_intv(fmi, c)
        for _ in range(int(rng.integers(0, 6))):
            ok = ref_extend(fmi, ik, is_back=bool(rng.integers(0, 2)))
            cand = [o for o in ok if o.size > 0]
            if not cand:
                break
            ik = cand[int(rng.integers(0, len(cand)))]
        iks.append(ik)
    arr = jnp.asarray([[i.x0, i.x1, i.size] for i in iks], dtype=jnp.int64)
    for is_back in (False, True):
        got = np.asarray(bwt_extend(didx, arr, is_back))
        for i, ik in enumerate(iks):
            want = ref_extend(fmi, ik, is_back)
            for c in range(4):
                w = (want[c].x0, want[c].x1, want[c].size)
                assert tuple(got[i, c]) == w, (i, c, is_back)


def test_sa_lookup_matches(setup):
    fmi, didx = setup
    rng = np.random.default_rng(3)
    ranks = rng.integers(1, fmi.seq_len + 1, 400)
    got = np.asarray(sa_lookup(didx, jnp.asarray(ranks)))
    for i, r in enumerate(ranks):
        assert got[i] == fmi.sa(int(r)), r


def test_get_ref_batch(setup):
    fmi, didx = setup
    starts = np.array([0, 17, 100, 2990])
    got = np.asarray(get_ref_batch(didx, jnp.asarray(starts), 16))
    for i, s in enumerate(starts):
        want = fmi.bnt.codes[s:s + 16]
        assert np.array_equal(got[i, :len(want)], want)


def test_sa_lookup_rank_walk_without_marks(tmp_path):
    """Stock-bwa-loaded indexes have no SA text marks (mark_D == 0);
    the device walk must fall back to the rank-sampled path and still
    match the host walk."""
    import numpy as np
    import jax.numpy as jnp
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.index.build import BntSeq, SeqAnn
    from tpubwa.device.occ import DeviceIndex, sa_lookup
    rng = np.random.default_rng(8)
    n = 6000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    bnt = BntSeq(l_pac=n, anns=[SeqAnn(name="t", anno="", offset=0,
                                       length=n, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    assert fmi.sa_mark_D
    # bwa round trip drops the marks (stock format has none)
    fmi.save_bwa(str(tmp_path / "g"))
    import shutil
    fmi2 = FMIndex.load_bwa(str(tmp_path / "g"))
    assert fmi2.sa_mark_D == 0
    didx = DeviceIndex.from_fmindex(fmi2)
    assert didx.mark_D == 0
    ranks = rng.integers(0, fmi.seq_len + 1, 300).astype(didx.np_idt)
    got = np.asarray(sa_lookup(didx, jnp.asarray(ranks)))
    want = np.array([fmi.sa(int(k)) for k in ranks])
    assert (got == want).all()


def test_shm_roundtrips_sa_marks(tmp_path):
    import numpy as np
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.index.build import BntSeq, SeqAnn
    rng = np.random.default_rng(9)
    n = 3000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    bnt = BntSeq(l_pac=n, anns=[SeqAnn(name="t", anno="", offset=0,
                                       length=n, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    fmi.save_shm(str(tmp_path / "g"))
    fmi2 = FMIndex.load_shm(str(tmp_path / "g"))
    assert fmi2.sa_mark_D == fmi.sa_mark_D
    assert (np.asarray(fmi2.sa_mark_rows)
            == np.asarray(fmi.sa_mark_rows)).all()
    assert (np.asarray(fmi2.sa_marked)
            == np.asarray(fmi.sa_marked)).all()
