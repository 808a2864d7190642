"""Index-sharded (TP) FM-index primitives == single-device primitives
on an 8-virtual-device mesh (SURVEY.md §2.2 TP row: occ/SA sharded by
k-range, answers routed by slab ownership + psum)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpubwa.device.occ import (DeviceIndex, bwt_extend, occ4,
                               sa_lookup)
from tpubwa.dist.index_tp import TpIndex
from tpubwa.index.fmindex import FMIndex
from tpubwa.index.build import BntSeq, SeqAnn


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    n = 30000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    bnt = BntSeq(l_pac=n, anns=[SeqAnn(name="t", anno="", offset=0,
                                       length=n, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    return fmi, DeviceIndex.from_fmindex(fmi), TpIndex(fmi, mesh)


def test_occ4_sharded_equals_replicated(setup):
    fmi, didx, tp = setup
    rng = np.random.default_rng(1)
    k = rng.integers(-1, fmi.seq_len + 1, 512).astype(tp.np_idt)
    got = np.asarray(tp.occ4(jnp.asarray(k)))
    want = np.asarray(occ4(didx, jnp.asarray(k)))
    assert (got == want).all()
    # per-chip slab is really 1/8 of the table
    shard_rows = tp.occ_blocks.sharding.shard_shape(
        tp.occ_blocks.shape)[0]
    assert shard_rows * 8 == tp.occ_blocks.shape[0]


@pytest.mark.parametrize("is_back", [False, True])
def test_bwt_extend_sharded(setup, is_back):
    fmi, didx, tp = setup
    rng = np.random.default_rng(2)
    # valid bi-intervals from single-base seeds, randomly advanced
    from tpubwa.device.occ import set_intv
    c = rng.integers(0, 4, 256).astype(tp.np_idt)
    ik = set_intv(didx, jnp.asarray(c))
    got = np.asarray(tp.bwt_extend(ik, is_back=is_back))
    want = np.asarray(bwt_extend(didx, ik, is_back=is_back))
    assert (got == want).all()


def test_sa_lookup_sharded(setup):
    fmi, didx, tp = setup
    rng = np.random.default_rng(4)
    ranks = rng.integers(0, fmi.seq_len + 1, 512).astype(tp.np_idt)
    got = np.asarray(tp.sa_lookup(jnp.asarray(ranks)))
    want = np.asarray(sa_lookup(didx, jnp.asarray(ranks)))
    assert (got == want).all()
    # ground truth for a sample against the host walk
    for r in ranks[:16]:
        assert fmi.sa(int(r)) == int(
            got[np.flatnonzero(ranks == r)[0]])
