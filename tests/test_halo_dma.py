"""Remote-DMA halo exchange == ppermute halo (Pallas TPU interpreter).

The interpreter (pltpu.InterpretParams) simulates the inter-device DMAs and
semaphores on the virtual CPU mesh — with race detection on — so the RDMA
ring shift is held to exact equality with parallel/halo.shard_hist, both
standalone and composed into a streaming FIR (HP377, the representative op
of VERDICT r1 #5).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import pytest

from sdr_pmr446_tpu.parallel import halo
from sdr_pmr446_tpu.kernels import halo_dma
from sdr_pmr446_tpu.ops import fir


def _mesh(n, name="time"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ring_shift_matches_ppermute(n_dev):
    mesh = _mesh(n_dev)
    x = np.arange(n_dev * 16 * 8, dtype=np.float32).reshape(n_dev * 16, 8)

    def body_dma(xs):
        return halo_dma.ring_shift_right(xs, "time", interpret=True)

    def body_ref(xs):
        num = jax.lax.axis_size("time")
        perm = [(i, (i + 1) % num) for i in range(num)]
        return jax.lax.ppermute(xs, "time", perm)

    run = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P("time"), out_specs=P("time"),
        check_vma=False))(x)
    got = np.asarray(run(body_dma))
    want = np.asarray(run(body_ref))
    np.testing.assert_array_equal(got, want)


def test_shard_hist_dma_matches_collective():
    n_dev = 4
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(0)
    hist_len = 13
    x = rng.standard_normal((n_dev * 64,)).astype(np.float32)
    carried = rng.standard_normal((hist_len,)).astype(np.float32)

    def body(fn, carried, xs):
        h, carry = fn(carried, xs, hist_len, "time")
        return h, carry

    for fn in (halo.shard_hist,
               functools.partial(halo_dma.shard_hist_dma, interpret=True)):
        out = jax.jit(jax.shard_map(
            functools.partial(body, fn), mesh=mesh,
            in_specs=(P(), P("time")),
            out_specs=(P("time"), P()),
            check_vma=False))(carried, x)
        h, carry = (np.asarray(a) for a in out)
        if fn is halo.shard_hist:
            want_h, want_carry = h, carry
        else:
            np.testing.assert_array_equal(h, want_h)
            np.testing.assert_array_equal(carry, want_carry)


def test_streaming_fir_with_dma_halo_equals_unsharded():
    """HP377 FIR over a time-sharded stream with RDMA halos == the
    unsharded streaming op, across multiple blocks (carried state)."""
    from sdr_pmr446_tpu.taps import design as D
    n_dev = 4
    mesh = _mesh(n_dev)
    taps = jnp.asarray(D.ctcss_hp_taps().astype(np.float32))
    hlen = taps.shape[0] - 1
    rng = np.random.default_rng(3)
    t_total = n_dev * 1225

    def sharded_body(carried, xs):
        h, carry = halo_dma.shard_hist_dma(carried, xs, hlen, "time",
                                           interpret=True)
        _, y = fir.fir_apply(h, xs, taps)
        return y, carry

    step = jax.jit(jax.shard_map(
        sharded_body, mesh=mesh,
        in_specs=(P(), P("time")), out_specs=(P("time"), P()),
        check_vma=False))

    carried = jnp.zeros((hlen,), jnp.float32)
    ref_hist = jnp.zeros((hlen,), jnp.float32)
    for _ in range(3):
        x = rng.standard_normal((t_total,)).astype(np.float32)
        y, carried = step(carried, x)
        ref_hist, y_ref = fir.fir_apply(ref_hist, jnp.asarray(x), taps)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(carried),
                                      np.asarray(ref_hist))


def test_ring_shift_on_2d_mesh():
    """RDMA halo along 'time' of a (stream, time) mesh: full mesh
    coordinates must address the right neighbor."""
    n_s, n_t = 2, 4
    devs = np.asarray(jax.devices()[: n_s * n_t]).reshape(n_s, n_t)
    mesh = Mesh(devs, ("stream", "time"))
    x = np.arange(n_s * n_t * 8, dtype=np.float32).reshape(n_s, n_t * 8)

    def body_dma(xs):
        return halo_dma.ring_shift_right(
            xs, "time", mesh_axes=("stream", "time"), interpret=True)

    def body_ref(xs):
        num = jax.lax.axis_size("time")
        perm = [(i, (i + 1) % num) for i in range(num)]
        return jax.lax.ppermute(xs, "time", perm)

    run = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P("stream", "time"),
        out_specs=P("stream", "time"), check_vma=False))(x)
    got = np.asarray(run(body_dma))
    want = np.asarray(run(body_ref))
    np.testing.assert_array_equal(got, want)
