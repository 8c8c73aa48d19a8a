"""Per-pass timing of the PDIP kernels on the real TPU at bench shapes."""
import time, os, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from reak_tpu.kte import models, lanes
from reak_tpu.ctrl import mpc
from reak_tpu.ops import riccati_bwd_pallas as rbp

B, H, n, m, iters = 8192, 50, 12, 6, 8
spec = models.manip_3r3r()
dt = 0.01
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.concatenate([rng.uniform(-0.5,0.5,(B,6)), rng.uniform(-0.2,0.2,(B,6))],1), jnp.float32)
u0 = jnp.zeros((B, H, m), jnp.float32)
roll = lanes.make_rollout_ltv_fused(spec, dt, H)
A_l, B_l, c_l, _ = jax.jit(roll)(x0, u0)
jax.block_until_ready(A_l)
Q = jnp.diag(jnp.concatenate([jnp.full(6,10.),jnp.full(6,1.)])).astype(jnp.float32)
QN = jnp.diag(jnp.concatenate([jnp.full(6,50.),jnp.full(6,5.)])).astype(jnp.float32)
R = (jnp.eye(m)*0.05).astype(jnp.float32)

qs = jnp.asarray(rng.standard_normal((H,n,B)), jnp.float32)*0.1
u_eff = jnp.zeros((H,m,B), jnp.float32)
D = jnp.ones((H,m,B), jnp.float32)
rhs = jnp.asarray(rng.standard_normal((H,m,B)), jnp.float32)*0.1
dx0 = jnp.zeros((n,B), jnp.float32)

def amort(f, args, reps=30):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/reps*1e3

res = {}
for tile in (512, 1024, 2048):
    if B % tile: continue
    bwd = jax.jit(rbp.make_fused_backward(H,n,m,tile=tile))
    grad,K,G,k = bwd(A_l,B_l,qs,u_eff,D,Q,QN,R); jax.block_until_ready(K)
    t_bwd = amort(bwd,(A_l,B_l,qs,u_eff,D,Q,QN,R))
    vb = jax.jit(rbp.make_vector_backward(H,n,m,tile=tile))
    t_vb = amort(vb,(A_l,B_l,rhs,K,G))
    fw = jax.jit(rbp.make_forward(H,n,m,tile=tile))
    t_fw = amort(fw,(A_l,B_l,K,k,dx0))
    res[tile] = dict(bwd_ms=round(t_bwd,3), vbwd_ms=round(t_vb,3), fwd_ms=round(t_fw,3))
    print(tile, res[tile], flush=True)

# analytic roofline per pass (bytes)
f=4
bwd_bytes = H*(n*n+ n*m + n + m + m)*f*B + H*(m + m*n + m*m + m)*f*B
vb_bytes  = H*(n*n + n*m + m + m*n + m*m)*f*B + H*m*f*B
fw_bytes  = H*(n*n + n*m + m*n + m)*f*B + H*(m+n)*f*B
for nm, by in (("bwd",bwd_bytes),("vbwd",vb_bytes),("fwd",fw_bytes)):
    print(nm, "roofline_ms", round(by/819e9*1e3,3))
print(json.dumps(res))
