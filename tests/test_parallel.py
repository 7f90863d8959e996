"""Multi-device sharded count tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from quickmer2_tpu.config import SearchConfig
from quickmer2_tpu.parallel.count_parallel import ShardedDepthCounter
from quickmer2_tpu.parallel.mesh import make_mesh
from quickmer2_tpu.pipelines import search as search_pipe
from quickmer2_tpu.pipelines.count import DepthCounter, make_packer
from tests import helpers

K = 30


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("par")
    chr1 = helpers.random_genome(rng, 40000)
    fa = str(d / "g.fa")
    helpers.write_fasta(fa, {"c1": chr1})
    cfg = SearchConfig(kmer_size=K, hash_size=1 << 16, edit_distance=0,
                       window_size=100)
    dic = search_pipe.run_search(fa, cfg, verbose=False)
    reads = helpers.simulate_reads(rng, chr1, 6000, 100)
    packer = make_packer("fasta-lines")
    blob = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    codes = packer.feed(blob)
    return {"dict": dic, "codes": codes}


@pytest.fixture(scope="module")
def single_device_depth(setup):
    c = DepthCounter(setup["dict"], batch_bases=1 << 16)
    c.feed_codes(setup["codes"])
    return c.finish()


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


@pytest.mark.parametrize("dp,ds", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_sharded_count_matches_single_device(setup, single_device_depth, dp, ds):
    mesh = make_mesh(dp, ds)
    c = ShardedDepthCounter(setup["dict"], mesh, batch_bases=1 << 16)
    c.feed_codes(setup["codes"])
    depth = c.finish()
    np.testing.assert_array_equal(depth, single_device_depth)


def test_sharded_determinism(setup):
    mesh = make_mesh(2, 4)
    outs = []
    for _ in range(2):
        c = ShardedDepthCounter(setup["dict"], mesh, batch_bases=1 << 15)
        c.feed_codes(setup["codes"])
        outs.append(c.finish())
    np.testing.assert_array_equal(outs[0], outs[1])
