import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from reak_tpu.kte import models, lanes
from reak_tpu.ctrl.riccati_soa import solve_box_mpc_riccati_soa_fused
from reak_tpu.ctrl import mpc

B, H, n, m = 8192, 50, 12, 6
spec = models.manip_3r3r()
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.concatenate([rng.uniform(-0.5,0.5,(B,6)), rng.uniform(-0.2,0.2,(B,6))],1), jnp.float32)
u0 = jnp.zeros((B, H, m), jnp.float32)
roll = lanes.make_rollout_ltv_fused(spec, 0.01, H)
A_l, B_l, c_l, _ = jax.jit(roll)(x0, u0); jax.block_until_ready(A_l)
Q = jnp.diag(jnp.concatenate([jnp.full(6,10.),jnp.full(6,1.)])).astype(jnp.float32)
QN = jnp.diag(jnp.concatenate([jnp.full(6,50.),jnp.full(6,5.)])).astype(jnp.float32)
R = (jnp.eye(m)*0.05).astype(jnp.float32)
lb, ub = jnp.full(m,-40.), jnp.full(m,40.)

def amort(f, reps=10):
    s = float(f()); t0=time.perf_counter()
    for _ in range(reps): out=f()
    s=float(out); return (time.perf_counter()-t0)/reps*1e3

for uk in ("auto","never"):
    times={}
    for it in (1,2,4,8):
        f = jax.jit(lambda A,Bm,c,xT,it=it,uk=uk: jnp.sum(solve_box_mpc_riccati_soa_fused(
            A,Bm,c,Q,QN,R,xT,lb,ub,iters=it,use_kernels=uk)[0]))
        times[it] = round(amort(lambda: f(A_l,B_l,c_l,x0.T)),2)
    per_iter = (times[8]-times[1])/7
    print(uk, times, "per_iter_ms", round(per_iter,2), flush=True)
