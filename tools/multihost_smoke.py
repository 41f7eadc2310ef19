"""multihost_smoke.py — validate the multi-host data-parallel path without
a cluster: two local processes, each with 4 virtual CPU devices, form one
8-device global mesh via jax.distributed and run a fully sharded training
step (per-process local batch shards assembled with
jax.make_array_from_process_local_data).

Usage (run both, e.g. from two shells or backgrounded):
    python tools/multihost_smoke.py 0 &
    python tools/multihost_smoke.py 1
Both ranks must print the same loss."""
import os, sys
proc_id = int(sys.argv[1])
port = os.environ.get("SCD_MULTIHOST_PORT", "12355")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
print(f"proc {proc_id}: global devices {len(jax.devices())}, local {len(jax.local_devices())}", flush=True)

import numpy as np, jax.numpy as jnp, optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scd_resnet_tpu.data.pipeline import augment_and_render_batch
from scd_resnet_tpu.models.center_net_offset import CenterNetLoss, CenterNetResidual

devices = np.array(jax.devices())
mesh = Mesh(devices, ("data",))
size, heat, batch = 64, 16, 8
model = CenterNetResidual(num_layers=10, dims=(16,16,32,64,128,64,64,64), terminal_hidden=32)
loss_fn = CenterNetLoss(0.1, 0.1)
tx = optax.adam(1e-3)
x0 = jnp.zeros((batch, size, size, 1), jnp.float32)
v = jax.jit(lambda k: model.init(k, x0, train=False), out_shardings=NamedSharding(mesh, P()))(jax.random.PRNGKey(0))
params, bs = v["params"], v["batch_stats"]
opt = jax.jit(tx.init, out_shardings=NamedSharding(mesh, P()))(params)

# per-process local batch shard -> global array
rng = np.random.default_rng(proc_id)
local = rng.normal(180, 20, (batch // 2, size, size)).astype(np.float32)
locs_l = np.zeros((batch // 2, 30, 8), np.float32); locs_l[:, 0] = [4,4,.5,.5,2,1,1.5,4]
counts_l = np.ones(batch // 2, np.int32)
shard = NamedSharding(mesh, P("data"))
def globalize(arr, shape):
    return jax.make_array_from_process_local_data(shard, arr, shape)
samples = globalize(local, (batch, size, size))
locs = globalize(locs_l, (batch, 30, 8))
counts = globalize(counts_l, (batch,))

def step(params, bs, opt, samples, locs, counts, key):
    xs, ys = augment_and_render_batch(key, samples, locs, counts, heat)
    def obj(p):
        outs, mut = model.apply({"params": p, "batch_stats": bs}, xs, train=True, mutable=["batch_stats"])
        l, _ = loss_fn([outs], ys)
        return l, mut["batch_stats"]
    (l, nbs), g = jax.value_and_grad(obj, has_aux=True)(params)
    u, nopt = tx.update(g, opt, params)
    return optax.apply_updates(params, u), nbs, nopt, l

jstep = jax.jit(step, in_shardings=(None, None, None, shard, shard, shard, None),
                out_shardings=None)
key = jax.random.PRNGKey(1)
for i in range(2):
    key, sub = jax.random.split(key)
    params, bs, opt, l = jstep(params, bs, opt, samples, locs, counts, sub)
lv = float(jax.device_get(l))
print(f"proc {proc_id}: multi-host step OK, loss={lv:.4f}", flush=True)
