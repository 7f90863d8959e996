"""Prototype: Pallas-fused Hamming-join compare chain vs the XLA slab
loop, same shapes. The XLA loop materializes ~8 (slab,cq,cpad) u32
intermediates per iteration to HBM; the Pallas kernel keeps the whole
chain in VMEM per block."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

B = 1 << 20
CPAD, CQ = 64, 32
K = 30
E = 2
from quickmer2_tpu.ops.hamming_join import _part_masks  # noqa: E402

masks = _part_masks(K)
MASKS = [(int(h), int(l)) for h, l in masks]


def kernel(dh_ref, dl_ref, do_ref, qh_ref, ql_ref, out_ref):
    dh = dh_ref[...]          # (S, CPAD) u32
    dl = dl_ref[...]
    do = do_ref[...]
    qh = qh_ref[...]          # (S, CQ) u32
    ql = ql_ref[...]
    xh = qh[:, :, None] ^ dh[:, None, :]
    xl = ql[:, :, None] ^ dl[:, None, :]
    yh = (xh | (xh >> 1)) & jnp.uint32(0x55555555)
    yl = (xl | (xl >> 1)) & jnp.uint32(0x55555555)
    ham = (jax.lax.population_count(yh)
           + jax.lax.population_count(yl)).astype(jnp.uint32)
    m = jnp.zeros(xh.shape, jnp.uint32)
    for mh, ml in MASKS:
        exact = ((xh & jnp.uint32(mh)) | (xl & jnp.uint32(ml))) == 0
        m = m + exact.astype(jnp.uint32)
    ok = (ham >= 1) & (ham <= jnp.uint32(E))
    scale = jnp.where(m > 0, jnp.uint32(6) // jnp.maximum(m, 1),
                      jnp.uint32(0))
    contrib = jnp.where(ok, do[:, None, :] * scale, jnp.uint32(0))
    # Mosaic: unsigned reductions unimplemented — sum as i32 (values
    # bounded by cpad * 255 * 6, far under 2^31)
    out_ref[...] = contrib.astype(jnp.int32).sum(
        axis=2, dtype=jnp.int32).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("s",))
def pallas_join(dh, dl, do, qh, ql, *, s: int):
    grid = (B // s,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((s, CPAD), lambda i: (i, 0)),
                  pl.BlockSpec((s, CPAD), lambda i: (i, 0)),
                  pl.BlockSpec((s, CPAD), lambda i: (i, 0)),
                  pl.BlockSpec((s, CQ), lambda i: (i, 0)),
                  pl.BlockSpec((s, CQ), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((s, CQ), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, CQ), jnp.uint32),
    )(dh, dl, do, qh, ql)


def xla_join(dh, dl, do, qh, ql, slab):
    def body(si, acc):
        dhs = jax.lax.dynamic_slice(dh, (si * slab, 0), (slab, CPAD))
        dls = jax.lax.dynamic_slice(dl, (si * slab, 0), (slab, CPAD))
        dos = jax.lax.dynamic_slice(do, (si * slab, 0), (slab, CPAD))
        qhs = jax.lax.dynamic_slice(qh, (si * slab, 0), (slab, CQ))
        qls = jax.lax.dynamic_slice(ql, (si * slab, 0), (slab, CQ))
        xh = qhs[:, :, None] ^ dhs[:, None, :]
        xl = qls[:, :, None] ^ dls[:, None, :]
        yh = (xh | (xh >> 1)) & jnp.uint32(0x55555555)
        yl = (xl | (xl >> 1)) & jnp.uint32(0x55555555)
        ham = (jax.lax.population_count(yh)
               + jax.lax.population_count(yl)).astype(jnp.uint32)
        m = jnp.zeros(xh.shape, jnp.uint32)
        for mh, ml in MASKS:
            exact = ((xh & jnp.uint32(mh)) | (xl & jnp.uint32(ml))) == 0
            m = m + exact.astype(jnp.uint32)
        ok = (ham >= 1) & (ham <= jnp.uint32(E))
        scale = jnp.where(m > 0, jnp.uint32(6) // jnp.maximum(m, 1),
                          jnp.uint32(0))
        contrib = jnp.where(ok, dos[:, None, :] * scale, jnp.uint32(0))
        out = contrib.sum(axis=2, dtype=jnp.uint32)
        return jax.lax.dynamic_update_slice(acc, out, (si * slab, 0))

    return jax.lax.fori_loop(0, B // slab, body,
                             jnp.zeros((B, CQ), jnp.uint32))


xla_join_j = jax.jit(xla_join, static_argnames=("slab",))


def main():
    rng = np.random.default_rng(0)
    dh = jnp.asarray(rng.integers(0, 1 << 28, (B, CPAD), dtype=np.uint32))
    dl = jnp.asarray(rng.integers(0, 1 << 31, (B, CPAD), dtype=np.uint32))
    do = jnp.asarray(rng.integers(0, 4, (B, CPAD), dtype=np.uint32))
    qh = jnp.asarray(rng.integers(0, 1 << 28, (B, CQ), dtype=np.uint32))
    ql = jnp.asarray(rng.integers(0, 1 << 31, (B, CQ), dtype=np.uint32))

    t0 = time.time()
    ref = xla_join_j(dh, dl, do, qh, ql, slab=2048)
    np.asarray(ref[:2])
    print(f"xla compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    ref = xla_join_j(dh, dl, do, qh, ql, slab=2048)
    np.asarray(ref[:2])
    t_xla = time.time() - t0
    print(f"xla warm {t_xla:.3f}s", flush=True)

    for s in (256, 512):
        try:
            t0 = time.time()
            out = pallas_join(dh, dl, do, qh, ql, s=s)
            np.asarray(out[:2])
            print(f"pallas s={s} compile+run {time.time() - t0:.1f}s",
                  flush=True)
            t0 = time.time()
            out = pallas_join(dh, dl, do, qh, ql, s=s)
            np.asarray(out[:2])
            t_p = time.time() - t0
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            print(f"pallas s={s} warm {t_p:.3f}s IDENTICAL "
                  f"({t_xla / t_p:.1f}x vs xla)", flush=True)
        except Exception as e:
            print(f"pallas s={s} FAILED: {str(e)[:300]}", flush=True)


main()
