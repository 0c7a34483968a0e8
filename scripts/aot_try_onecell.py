"""One-off local AOT lowering check for the one-cell decode kernel
(round 5; see scripts/aot_compile_check.py for the mechanism)."""
import os, sys
_ENV = {"PALLAS_AXON_POOL_IPS": "", "PALLAS_AXON_REMOTE_COMPILE": "",
        "JAX_PLATFORMS": "cpu", "TPU_SKIP_MDS_QUERY": "1",
        "TPU_WORKER_HOSTNAMES": "localhost"}
if any(os.environ.get(k) != v for k, v in _ENV.items()):
    os.execve(sys.executable, [sys.executable] + sys.argv, {**os.environ, **_ENV})
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp
from jax.experimental import topologies
from tpu_captioner.ops.decode_step import DecodeWeights, fused_decode_step

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec
topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
mesh = Mesh(np.array(list(topo.devices)[:1]), ("d",))
rep = NamedSharding(mesh, PartitionSpec())
def sd(shape, dt):
    return jax.ShapeDtypeStruct(shape, dt, sharding=rep)

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
one_cell = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
L, T, E, P, H = 6, 53, 512, 49, 8
F = 4 * E
bf = jnp.bfloat16
_sd = sd
def sd(shape, dt=bf): return _sd(shape, dt)
w = DecodeWeights(
    w_qkv=sd((L,E,3*E)), b_qkv=sd((L,1,3*E), jnp.float32),
    w_so=sd((L,E,E)), b_so=sd((L,1,E), jnp.float32),
    w_cq=sd((L,E,E)), b_cq=sd((L,1,E), jnp.float32),
    w_co=sd((L,E,E)), b_co=sd((L,1,E), jnp.float32),
    w_f1=sd((L,E,F)), b_f1=sd((L,1,F), jnp.float32),
    w_f2=sd((L,F,E)), b_f2=sd((L,1,E), jnp.float32),
    ln1_s=sd((L,1,E), jnp.float32), ln1_b=sd((L,1,E), jnp.float32),
    ln2_s=sd((L,1,E), jnp.float32), ln2_b=sd((L,1,E), jnp.float32),
    ln3_s=sd((L,1,E), jnp.float32), ln3_b=sd((L,1,E), jnp.float32))
x = sd((R,E))
ck = sd((L,R,T,E)); mk = sd((L,R,P,E))
pos = jax.ShapeDtypeStruct((), jnp.int32)

def f(w, x, pos, ck, cv, mk, mv):
    return fused_decode_step(w, x, pos, ck, cv, mk, mv, H,
                             precise=False, one_cell=one_cell)

t0 = time.time()
lowered = jax.jit(
    f, compiler_options={"xla_tpu_scoped_vmem_limit_kib": 102400}
).trace(w, x, pos, ck, ck, mk, mk).lower()
compiled = lowered.compile()
ms = compiled.memory_analysis()
print("COMPILED R=%d one_cell=%s in %.1fs  temp=%.1fMB" %
      (R, one_cell, time.time()-t0, ms.temp_size_in_bytes/1e6), flush=True)
