import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from reak_tpu.kte import models, lanes
from reak_tpu.ops import riccati_bwd_pallas as rbp

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
qs = jnp.asarray(rng.standard_normal((H,n,B)), jnp.float32)*0.1
u_eff = jnp.zeros((H,m,B), jnp.float32)
D = jnp.ones((H,m,B), jnp.float32)

tile=512
bwd = jax.jit(rbp.make_fused_backward(H,n,m,tile=tile))
# chained: feed grad back into qs-slot so each call depends on the last
def chain(qs0, reps):
    q = qs0
    out=None
    for _ in range(reps):
        grad,K,G,k = bwd(A_l,B_l,jnp.concatenate([grad_pad(grad := None) if False else q[:, :n-0, :]],axis=1) if False else q,u_eff,D,Q,QN,R)
        q = q + 1e-9*jnp.concatenate([grad, grad], axis=1)  # (H,2m=12,B) == (H,n,B)
    return q
_ = chain(qs, 1); 
x = chain(qs, 1); jax.block_until_ready(x)
t0=time.perf_counter(); x = chain(qs, 20); jax.block_until_ready(x)
t=(time.perf_counter()-t0)/20
print("chained bwd+glue ms:", round(t*1e3,3))
# single un-chained for comparison
t0=time.perf_counter()
for _ in range(20): out = bwd(A_l,B_l,qs,u_eff,D,Q,QN,R)
jax.block_until_ready(out)
print("unchained bwd ms:", round((time.perf_counter()-t0)/20*1e3,3))
