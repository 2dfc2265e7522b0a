"""Sharded engine execution over a device mesh.

Runs the rolled-ring convolver step (``core.convolver.step_rolled``) under
jit with NamedShardings from ``parallel.mesh``: channels sharded over "c",
partitions (and the ring of delayed spectra) over "p". XLA/GSPMD then emits:

- the partition MAC reduce -> psum over "p" (ICI all-reduce)
- the static ring roll     -> nearest-neighbor boundary collective-permute
- the block FFT matmuls    -> per-shard MXU matmuls, channels independent

This is the "channels+partitions sharded, spectra exchanged via ICI
collectives, partials psum'd" design of BASELINE.json's north star. The
reference has no counterpart (single-threaded C++, SURVEY.md §2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bfir_tpu.core import convolver as cv
from bfir_tpu.core.spec import FilterSpec
from bfir_tpu.parallel import mesh as M


class ShardedEngine:
    def __init__(self, spec: FilterSpec, n_channels: int, mesh: Mesh):
        if spec.n_partitions % mesh.shape["p"]:
            raise ValueError(
                f"n_partitions {spec.n_partitions} not divisible by mesh p={mesh.shape['p']}")
        if n_channels % mesh.shape["c"]:
            raise ValueError(
                f"n_channels {n_channels} not divisible by mesh c={mesh.shape['c']}")
        self.spec = spec
        self.n_channels = n_channels
        self.mesh = mesh
        st_sh = M.state_shardings(mesh)
        self._state_shardings = cv.ConvolverState(
            spectra_ring=st_sh["spectra_ring"],
            prev_block=st_sh["prev_block"],
            blockcounter=st_sh["blockcounter"],
        )
        self._coeff_sharding = M.coeff_sharding(mesh)
        self._block_sharding = M.block_sharding(mesh)
        self._step = jax.jit(
            cv.step_rolled,
            in_shardings=(self._state_shardings, self._coeff_sharding,
                          self._block_sharding),
            out_shardings=(self._state_shardings, self._block_sharding),
            donate_argnums=0,
        )
        self._batch = None
        # placement helpers that work for complex dtypes on backends where
        # complex host->device transfer is unavailable (see ops.fft)
        self._place_coeffs = jax.jit(lambda x: x, out_shardings=self._coeff_sharding)
        self._init = jax.jit(
            lambda: cv.init_state(spec, n_channels),
            out_shardings=self._state_shardings,
            static_argnums=(),
        )

    def init_state(self) -> cv.ConvolverState:
        return self._init()

    def prepare_coeffs(self, impulse, scale: float = 1.0) -> jax.Array:
        coeffs = cv.coeffs_to_spectra(impulse, self.spec, scale=scale)
        return self._place_coeffs(coeffs)

    def step(self, state, coeffs, block) -> Tuple[cv.ConvolverState, jax.Array]:
        return self._step(state, coeffs, block)

    def process_batch(self, state, coeffs, blocks) -> Tuple[cv.ConvolverState, jax.Array]:
        """Sharded bulk mode: B blocks per dispatch (core.convolver.
        process_batch) with channels sharded over "c" and the ring/coeffs
        over ("p", "c"). The block-axis FFT intermediates carry no partition
        axis, so the "p" shards only hold ring/coeff storage while "c"
        parallelizes the compute — the pod-scale layout of BASELINE
        config #5 (channels across hosts, partitions within).

        State representation: this engine's ``step`` keeps the ring in
        *rolled* layout while ``cv.process_batch`` uses the pointer layout;
        the jitted wrapper converts on entry and back on exit, so ``step``
        and ``process_batch`` interoperate freely on the same state.
        """
        if self._batch is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def batch_fn(state, coeffs, blocks):
                st_ptr = cv.state_from_rolled(state)
                st_ptr, outs = cv.process_batch(st_ptr, coeffs, blocks)
                return cv.rolled_from_state(st_ptr), outs

            blocks_sh = NamedSharding(self.mesh, P(None, "c", None))
            self._batch = jax.jit(
                batch_fn,
                in_shardings=(self._state_shardings, self._coeff_sharding, blocks_sh),
                out_shardings=(self._state_shardings, blocks_sh),
                donate_argnums=0,
            )
        return self._batch(state, coeffs, blocks)


def make_ppermute_step(mesh: Mesh, spec: FilterSpec, n_channels: int):
    """Explicit ICI ring-pipeline step via shard_map (SURVEY.md §2: "rotate
    spectrum ring slices while accumulating partial sums").

    State layout equals the *rolled* representation sharded over ("p","c"):
    globally, ring[i] holds the spectrum delayed by i blocks, so the shard
    on partition-device p covers delays [p*K, (p+1)*K). Per step:

    - every device computes the new input spectrum locally (cheap, avoids a
      broadcast),
    - each device ppermutes its *oldest* slot to the next device — the only
      inter-device data motion, one [C_local, F] spectrum over a
      nearest-neighbor ICI hop,
    - shifts its local ring by one, inserting the received spectrum (device
      0 inserts the fresh one),
    - MACs its local partitions and psums partials over "p".

    Numerically identical to ``core.convolver.step_rolled``; unlike the
    GSPMD-compiled version, the communication schedule is explicit and
    guaranteed nearest-neighbor.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bfir_tpu.ops import fft as F

    n = spec.block_length
    np_shards = mesh.shape["p"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("p", "c", None), P("c", None), P(), P("p", "c", None), P("c", None)),
        out_specs=(P("p", "c", None), P("c", None), P(), P("c", None)),
    )
    def body(ring_local, prev_local, counter, coeffs_local, block_local):
        block_local = block_local.astype(prev_local.dtype)
        frame = jnp.concatenate([prev_local, block_local], axis=-1)
        x = F.rfft(frame, axis=-1)  # [C_local, F], identical on every p shard

        oldest = ring_local[-1]
        if np_shards > 1:
            recv = jax.lax.ppermute(
                oldest, "p", [(i, (i + 1) % np_shards) for i in range(np_shards)]
            )
        else:
            recv = oldest
        p_idx = jax.lax.axis_index("p")
        newest = jnp.where(p_idx == 0, x, recv)
        ring_local = jnp.concatenate([newest[None], ring_local[:-1]], axis=0)

        y = jax.lax.psum(jnp.sum(coeffs_local * ring_local, axis=0), "p")
        out = F.irfft(y, axis=-1)[..., n:]
        return ring_local, block_local, counter + 1, out

    def step(state: cv.ConvolverState, coeffs, block):
        ring, prev, counter, out = body(
            state.spectra_ring, state.prev_block, state.blockcounter, coeffs, block
        )
        return cv.ConvolverState(ring, prev, counter), out

    return step


def dryrun(n_devices: Optional[int] = None, mesh: Optional[Mesh] = None) -> None:
    """Compile + execute one sharded step on tiny shapes over the given or
    default mesh. Used by __graft_entry__.dryrun_multichip."""
    m = mesh if mesh is not None else M.make_mesh(
        channel_shards=2 if (n_devices or 1) % 2 == 0 and (n_devices or 1) > 1 else 1,
        devices=jax.devices()[: n_devices] if n_devices else None,
    )
    c = 2 * m.shape["c"]
    p = 2 * m.shape["p"]
    spec = FilterSpec(block_length=128, n_partitions=p, dtype="float32")
    eng = ShardedEngine(spec, c, m)
    state = eng.init_state()
    rng = np.random.default_rng(0)
    h = rng.standard_normal((c, spec.max_taps)).astype(np.float32) * 0.05
    coeffs = eng.prepare_coeffs(h)
    out_all = []
    x = rng.standard_normal((c, 4 * spec.block_length)).astype(np.float32)
    for b in range(4):
        block = x[:, b * spec.block_length : (b + 1) * spec.block_length]
        state, out = eng.step(state, coeffs, block)
        out_all.append(np.asarray(out))
    y = np.concatenate(out_all, axis=1)
    # cross-check vs the single-device reference path
    st2 = cv.init_state(spec, c)
    co2 = cv.coeffs_to_spectra(h, spec)
    outs2 = []
    for b in range(4):
        st2, o2 = cv.step(st2, co2, x[:, b * spec.block_length : (b + 1) * spec.block_length])
        outs2.append(np.asarray(o2))
    y2 = np.concatenate(outs2, axis=1)
    err = float(np.max(np.abs(y - y2)))
    if err > 1e-3:
        raise AssertionError(f"sharded step diverged from single-device: {err}")
