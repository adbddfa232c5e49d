"""Pallas async remote-copy DMA halo exchange — the kernel-level
alternative to the ppermute halo (SURVEY.md:173 / §5 comm-backend row:
"optionally Pallas `make_async_remote_copy` DMA for fused kernel-level
halo exchange").

Inside a `shard_map` over the time-block axis, each device DMAs its
(K-1)-sample block tail directly into its right neighbour's left-context
buffer (and its head into the left neighbour's right-context buffer)
over ICI, instead of routing the halo through XLA's ppermute collective.
Stream edges are zero-filled (device 0 gets a zero left context, the
last device a zero right context), matching the single-device 'same'
padding exactly — the same convention as `parallel/sharded.py`'s
`_shift_from_left`/`_shift_from_right`.

Status: verified bit-exact against the ppermute halo on an 8-device CPU
mesh via the Mosaic TPU interpret mode (`pltpu.InterpretParams`), which
models the remote DMAs and semaphores; real-pod silicon validation needs
multi-chip hardware (structurally absent here — one tunnel chip). The
prototype keeps the whole per-device (channels, block+halo) slab in
VMEM; a production pod kernel would add a grid over channel tiles and
fuse the local FIR compute into the same kernel so the halo DMA overlaps
the matmul. Not in the reference (single-device Elixir)."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["halo_extend_dma"]


def _halo_kernel(idx_ref, x_ref, ext_ref, comm_l, comm_r, send_sem,
                 recv_sem, *, hl, hr, n_dev, axis_name):
    """Single-program halo kernel: ext = [left halo | block | right halo].

    Two independent async remote copies (one per direction), each with
    its own send/recv semaphore pair; `pl.when` guards skip the send at
    the stream edges and the matching receive wait on the other side, so
    no device ever blocks on a semaphore that will not be signalled.
    Neighbours are addressed with `DeviceIdType.MESH` ({axis: index}),
    which moves only along the block axis — correct on multi-axis meshes
    (a LOGICAL scalar id would alias across the channel axis).
    """
    my_id = idx_ref[0]
    n = x_ref.shape[-1]
    ext_ref[:, hl:hl + n] = x_ref[:]
    if hl:
        ext_ref[:, :hl] = jnp.zeros_like(ext_ref[:, :hl])
    if hr:
        ext_ref[:, hl + n:] = jnp.zeros_like(ext_ref[:, hl + n:])
    if hl:
        # my tail -> right neighbour's left-context buffer
        rdma_r = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[:, n - hl:], dst_ref=comm_l,
            send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
            device_id={axis_name: (my_id + 1) % n_dev},
            device_id_type=pltpu.DeviceIdType.MESH)

        @pl.when(my_id < n_dev - 1)
        def _send_right():
            rdma_r.start()
            rdma_r.wait_send()

        @pl.when(my_id > 0)
        def _recv_left():
            rdma_r.wait_recv()
            ext_ref[:, :hl] = comm_l[:]
    if hr:
        # my head -> left neighbour's right-context buffer
        rdma_l = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[:, :hr], dst_ref=comm_r,
            send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
            device_id={axis_name: (my_id - 1) % n_dev},
            device_id_type=pltpu.DeviceIdType.MESH)

        @pl.when(my_id > 0)
        def _send_left():
            rdma_l.start()
            rdma_l.wait_send()

        @pl.when(my_id < n_dev - 1)
        def _recv_right():
            rdma_l.wait_recv()
            ext_ref[:, hl + n:] = comm_r[:]


def halo_extend_dma(x_blk, pad_left: int, pad_right: int, *, axis_name,
                    n_dev: int, interpret=None):
    """Extend a (channels, block) shard with neighbour halos via Pallas
    async remote-copy DMA. Call INSIDE `shard_map` over `axis_name`
    (the time-block mesh axis); returns
    (channels, pad_left + block + pad_right) with zero-filled stream
    edges — drop-in for the ppermute+concat halo of
    `parallel.sharded.sharded_convolve_same` (bitwise-equal, tested).

    `interpret=None` auto-selects the Mosaic TPU interpret mode when the
    default backend is CPU (the only way to model remote DMAs off-chip);
    pass `interpret=False` to force real Mosaic compilation on TPU.

    Examples:

    >>> import numpy as np
    >>> import jax
    >>> import jax.numpy as jnp
    >>> from jax.sharding import PartitionSpec as P
    >>> from nx_signal_tpu.kernels.pallas_halo import halo_extend_dma
    >>> from nx_signal_tpu.parallel.mesh import make_dsp_mesh
    >>> mesh = make_dsp_mesh(2, 4)
    >>> x = jnp.asarray(np.arange(32.0, dtype=np.float32).reshape(1, 32))
    >>> ext = jax.jit(jax.shard_map(
    ...     lambda b: halo_extend_dma(b, 2, 1, axis_name='block', n_dev=4),
    ...     mesh=mesh, in_specs=P(None, 'block'),
    ...     out_specs=P(None, 'block')))(x)
    >>> np.asarray(ext[0, :11])   # block 0: zero left halo, right halo 8
    array([0., 0., 0., 1., 2., 3., 4., 5., 6., 7., 8.], dtype=float32)
    """
    if pad_left == 0 and pad_right == 0:
        return x_blk
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    c, n = x_blk.shape
    if max(pad_left, pad_right) > n:
        raise ValueError(
            f"halo ({max(pad_left, pad_right)}) exceeds the per-device "
            f"block ({n})")
    idx = jnp.full((1,), jax.lax.axis_index(axis_name), jnp.int32)
    kernel = functools.partial(_halo_kernel, hl=pad_left, hr=pad_right,
                               n_dev=n_dev, axis_name=axis_name)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (c, pad_left + n + pad_right), x_blk.dtype,
            vma=frozenset({axis_name})),
        scratch_shapes=[
            pltpu.VMEM((c, max(pad_left, 1)), x_blk.dtype),
            pltpu.VMEM((c, max(pad_right, 1)), x_blk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # no collective_id: the kernel uses no barrier semaphore, and real
        # Mosaic rejects a collective_id without one (silicon check r05)
        interpret=interpret,
    )(idx, x_blk)
