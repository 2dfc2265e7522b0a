"""Sharded engine execution over a device mesh.

The product path is an explicit ``shard_map`` ring schedule
(``make_ppermute_step``): channels sharded over mesh axis "c", the ring of
delayed input spectra and the coefficient partitions over "p". Per step,
each device rotates its oldest ring slot to its "p"-neighbor (one
nearest-neighbor ICI ``collective-permute`` of a [C_local, F] spectrum),
MACs its local partitions, and ``psum``s partials over "p" (one ICI
all-reduce). That is the *entire* per-step communication; the compiled HLO
is asserted in ``tests/test_parallel.py::test_hlo_collectives`` to contain
exactly these collectives and **no all-gather**.

A GSPMD alternative (jit-compiling ``core.convolver.step_rolled`` under
NamedShardings, ``schedule="gspmd"``) is kept as a numerical cross-check;
measured at the compiler level it inserts extra all-gathers around the ring
insert, so it is NOT the flagship path. See ``parallel/COMM_MODEL.md`` for
the bytes-per-step communication model backing the scaling target.

This is the "channels+partitions sharded, spectra exchanged via ICI
collectives, partials psum'd" design of BASELINE.json's north star. The
reference has no counterpart (single-threaded C++, SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bfir_tpu.core import convolver as cv
from bfir_tpu.core.spec import FilterSpec
from bfir_tpu.parallel import mesh as M


def _ring_body(mesh: Mesh, block_length: int):
    """The shared per-shard ring schedule: rotate the oldest ring slot to
    the next "p" device, insert the fresh spectrum on device 0, and return
    (new_ring, input spectrum x). Factored out so the plain step and the
    crossfade step use the identical communication schedule."""
    np_shards = mesh.shape["p"]

    def advance(ring_local, prev_local, block_local):
        frame = jnp.concatenate([prev_local, block_local], axis=-1)
        from bfir_tpu.ops import fft as F

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
        return ring_local

    return advance


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
    guaranteed nearest-neighbor (verified at the HLO level in
    tests/test_parallel.py::test_hlo_collectives).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bfir_tpu.ops import fft as F

    n = spec.block_length
    advance = _ring_body(mesh, n)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("p", "c", None), P("c", None), P(), P("p", "c", None), P("c", None)),
        out_specs=(P("p", "c", None), P("c", None), P(), P("c", None)),
    )
    def body(ring_local, prev_local, counter, coeffs_local, block_local):
        block_local = block_local.astype(prev_local.dtype)
        ring_local = advance(ring_local, prev_local, block_local)
        y = jax.lax.psum(jnp.sum(coeffs_local * ring_local, axis=0), "p")
        out = F.irfft(y, axis=-1)[..., n:]
        return ring_local, block_local, counter + 1, out

    def step(state: cv.ConvolverState, coeffs, block):
        ring, prev, counter, out = body(
            state.spectra_ring, state.prev_block, state.blockcounter, coeffs, block
        )
        return cv.ConvolverState(ring, prev, counter), out

    return step


def make_ppermute_crossfade_step(mesh: Mesh, spec: FilterSpec, n_channels: int):
    """Crossfade variant of the ppermute step: one ring advance, two MACs
    (old and new coefficient sets), linear ramp between the two outputs —
    the sharded form of ``core.convolver.step_crossfade``
    (``convolver_crossfade_inplace``, fftw_convolver.cpp:275-321). Costs one
    extra psum+irfft; the ring schedule (one ppermute) is unchanged."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bfir_tpu.ops import fft as F

    n = spec.block_length
    advance = _ring_body(mesh, n)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("p", "c", None), P("c", None), P(),
                  P("p", "c", None), P("p", "c", None), P("c", None)),
        out_specs=(P("p", "c", None), P("c", None), P(), P("c", None)),
    )
    def body(ring_local, prev_local, counter, co_old, co_new, block_local):
        block_local = block_local.astype(prev_local.dtype)
        ring_local = advance(ring_local, prev_local, block_local)
        y_old = jax.lax.psum(jnp.sum(co_old * ring_local, axis=0), "p")
        y_new = jax.lax.psum(jnp.sum(co_new * ring_local, axis=0), "p")
        out_old = F.irfft(y_old, axis=-1)[..., n:]
        out_new = F.irfft(y_new, axis=-1)[..., n:]
        ramp = jnp.arange(n, dtype=out_old.dtype) / (n - 1)
        out = out_old * (1.0 - ramp) + out_new * ramp
        return ring_local, block_local, counter + 1, out

    def step(state: cv.ConvolverState, coeff_old, coeff_new, block):
        ring, prev, counter, out = body(
            state.spectra_ring, state.prev_block, state.blockcounter,
            coeff_old, coeff_new, block,
        )
        return cv.ConvolverState(ring, prev, counter), out

    return step


class ShardedEngine:
    """Multi-device partitioned convolver.

    ``schedule="ppermute"`` (default, the product path): explicit shard_map
    ring with guaranteed nearest-neighbor communication.
    ``schedule="gspmd"``: jit of ``core.convolver.step_rolled`` under
    NamedShardings, letting GSPMD choose the collectives — kept as a
    numerical cross-check (it inserts extra all-gathers; see module
    docstring)."""

    def __init__(self, spec: FilterSpec, n_channels: int, mesh: Mesh,
                 schedule: str = "ppermute"):
        if spec.n_partitions % mesh.shape["p"]:
            raise ValueError(
                f"n_partitions {spec.n_partitions} not divisible by mesh p={mesh.shape['p']}")
        if n_channels % mesh.shape["c"]:
            raise ValueError(
                f"n_channels {n_channels} not divisible by mesh c={mesh.shape['c']}")
        if schedule not in ("ppermute", "gspmd"):
            raise ValueError(f"schedule must be ppermute or gspmd, got {schedule!r}")
        self.spec = spec
        self.n_channels = n_channels
        self.mesh = mesh
        self.schedule = schedule
        st_sh = M.state_shardings(mesh)
        self._state_shardings = cv.ConvolverState(
            spectra_ring=st_sh["spectra_ring"],
            prev_block=st_sh["prev_block"],
            blockcounter=st_sh["blockcounter"],
        )
        self._coeff_sharding = M.coeff_sharding(mesh)
        self._block_sharding = M.block_sharding(mesh)
        self._step_fn = (
            make_ppermute_step(mesh, spec, n_channels)
            if schedule == "ppermute" else cv.step_rolled
        )
        self._step = jax.jit(
            self._step_fn,
            in_shardings=(self._state_shardings, self._coeff_sharding,
                          self._block_sharding),
            out_shardings=(self._state_shardings, self._block_sharding),
            donate_argnums=0,
        )
        self._xfade_fn = None
        self._xfade = None
        self._batch = None
        self._scan = None
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

    def step_crossfade(self, state, coeff_old, coeff_new, block):
        """Glitch-free filter swap: one sharded block with old->new ramp."""
        if self._xfade is None:
            fn = (make_ppermute_crossfade_step(self.mesh, self.spec, self.n_channels)
                  if self.schedule == "ppermute" else cv.step_crossfade)
            self._xfade = jax.jit(
                fn,
                in_shardings=(self._state_shardings, self._coeff_sharding,
                              self._coeff_sharding, self._block_sharding),
                out_shardings=(self._state_shardings, self._block_sharding),
            )
        return self._xfade(state, coeff_old, coeff_new, block)

    def process_blocks(self, state, coeffs, blocks):
        """Streaming-exact scan over [B, C, N] blocks, one sharded dispatch
        (the sharded form of ``core.convolver.process_blocks``)."""
        if self._scan is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            step_fn = self._step_fn

            def scan_fn(st, co, blks):
                def body(s, blk):
                    return step_fn(s, co, blk)
                return jax.lax.scan(body, st, blks)

            blocks_sh = NamedSharding(self.mesh, P(None, "c", None))
            self._scan = jax.jit(
                scan_fn,
                in_shardings=(self._state_shardings, self._coeff_sharding, blocks_sh),
                out_shardings=(self._state_shardings, blocks_sh),
                donate_argnums=0,
            )
        return self._scan(state, coeffs, blocks)

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
    # tight f32 tolerance: on these tiny shapes any real sharding bug is a
    # gross error; 1e-5 leaves ~30x headroom over observed fp noise
    if err > 1e-5:
        raise AssertionError(f"sharded step diverged from single-device: {err}")
