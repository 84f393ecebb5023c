"""Probe harness: Pallas TPU interpret mode under shard_map on
low-core-count hosts (ROADMAP #12; upstream report material).

Observed on this repo's 1-CPU-core container:

* the repo's streaming super-kernels inside ``shard_map`` over 8 virtual
  CPU devices (``--xla_force_host_platform_device_count=8``) DEADLOCK in
  interpret mode (4 devices complete in ~10 s); the heavier 3D kernels
  hit the wall at 4 devices (3 work);
* r2 py-spy forensics: all device threads blocked inside the interpret
  machinery's shared-memory allocator ``io_callback`` while the
  clock/barrier advance (``update_clocks_for_device_barrier``) starves —
  a thread-starvation deadlock between per-device executor threads and
  the host callback pool, thresholded by host core count.

REPRO STATUS (r3): this file's minimal kernel — one ANY-space operand +
VMEM scratch + async DMA per shard, the same structural pattern — does
NOT reproduce on the current jax at 8 devices (5/5 clean completions),
while the repo's full sharded V-cycle (dist.pallas_cycle, dozens of
sequential kernel launches interleaved with ppermute ghost exchanges)
still wedges.  Chaining 50 DMA kernels per shard (``argv[2]``) does not
reproduce either — so sustained callback pressure alone is insufficient;
the missing ingredient is most likely the ppermute collectives
interleaved between interpret launches (the real path's ghost
exchanges), which add device-barrier callbacks to the same pool.

Run (choose a device count):

    python docs/interpret_deadlock_repro.py 4    # completes on 1 core
    timeout 120 python docs/interpret_deadlock_repro.py 8

Workarounds used by this repo (CLAUDE.md):
* keep interpret+shard_map tests and the dryrun's Pallas paths on <= 4
  (2D) / <= 3 (3D) virtual devices;
* jit-wrap whole cycles so each interpret region is ONE program, and
  ``block_until_ready`` between interpret launches (eager interpret
  dispatch races the device-barrier callbacks the same way).
"""

import os
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + f" --xla_force_host_platform_device_count={N}").strip()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")


def add_one_kernel(x_hbm, o_hbm, scratch, sem_in, sem_out):
    # The deadlock involves interpret mode's SHARED-MEMORY machinery (the
    # r2 py-spy forensics: all device threads blocked in the interpret
    # allocator's io_callback while the device-barrier clock advance
    # starves) — so the repro kernel must do what the real streaming
    # kernels do: ANY-space operands + manual VMEM DMA.
    cp_in = pltpu.make_async_copy(x_hbm, scratch, sem_in)
    cp_in.start()
    cp_in.wait()
    scratch[...] = scratch[...] + 1.0
    cp_out = pltpu.make_async_copy(scratch, o_hbm, sem_out)
    cp_out.start()
    cp_out.wait()


def add_one(x):
    return pl.pallas_call(
        add_one_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM(x.shape, x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(x)


def main():
    devs = jax.devices()[:N]
    mesh = Mesh(np.asarray(devs).reshape(N, 1), ("gy", "gx"))
    x = jnp.zeros((8 * N, 128), jnp.float32)

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=P("gy", "gx"),
                       out_specs=P("gy", "gx"), check_vma=False)
    def run(x):
        for _ in range(reps):  # sustained callback pressure (see header)
            x = add_one(x)
        return x

    print(f"devices={N}: launching {reps} DMA Pallas kernel(s) per shard "
          "(interpret mode)...", flush=True)
    with pltpu.force_tpu_interpret_mode():
        out = run(x)
        jax.block_until_ready(out)
    print("completed OK:", float(out.sum()), flush=True)


if __name__ == "__main__":
    main()
