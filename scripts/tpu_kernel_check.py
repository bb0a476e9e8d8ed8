import os
import sys; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend())
from vqvaehmm_tpu import make_model
from vqvaehmm_tpu.ops.pallas_encoder import fused_encode
from vqvaehmm_tpu.ops.pallas_hmm import viterbi_pallas
from vqvaehmm_tpu.ops import hmm as hops
from vqvaehmm_tpu.ops.vq import vq_lookup, vq_pallas

rng = np.random.default_rng(0)

# 1. fused encoder on TPU
model = make_model(5, 64, 3, 32, u_dim=4, trans_hidden=128)
params = model.init(jax.random.PRNGKey(0))
x = jnp.asarray(rng.normal(size=(8, 5, 64)).astype(np.float32))
ref = model.encode(params, x)
got = fused_encode(params, x, interpret=False)
print("fused_encode TPU maxdiff:", float(jnp.abs(ref - got).max()))

# 2. pallas viterbi on TPU
B, T, K = 20, 50, 3
log_pi = jnp.log(jnp.asarray(rng.dirichlet(np.ones(K)).astype(np.float32)))
log_A = jnp.log(jnp.asarray(rng.dirichlet(np.ones(K), size=(B,T,K)).astype(np.float32)))
log_obs = jnp.asarray(rng.normal(size=(B,T,K)).astype(np.float32))
r = hops.viterbi(log_pi, log_A, log_obs)
g = viterbi_pallas(log_pi, log_A, log_obs, interpret=False)
print("viterbi TPU paths equal:", bool((np.asarray(r.states)==np.asarray(g.states)).all()),
      "score maxdiff:", float(jnp.abs(r.score-g.score).max()))

# 2b. fused serving forward on TPU (ops/pallas_infer.py)
from vqvaehmm_tpu.ops.pallas_infer import fused_forward
xs = jnp.asarray(rng.normal(size=(16, 5, 200)).astype(np.float32))
mu_r, lv_r, q_r = model.infer_forward(params, xs, valid_to=jnp.asarray(200),
                                      use_pallas=False)
mu_g, lv_g, q_g = fused_forward(model, params, xs,
                                valid_to=jnp.asarray(200), interpret=False)
print("fused_forward TPU maxdiff:",
      float(jnp.abs(mu_r - mu_g).max()),
      float(jnp.abs(q_r - q_g).max()))

# 3. pallas VQ on TPU
z = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
cb = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
zq_r, idx_r = vq_lookup(z, cb)
zq_p, idx_p = vq_pallas(z, cb, block_rows=128, interpret=False)
print("vq TPU idx equal:", bool((np.asarray(idx_r)==np.asarray(idx_p)).all()),
      "zq maxdiff:", float(jnp.abs(zq_r-zq_p).max()))
# 4. fused train step at the raised-VMEM-budget 'big' config (H=256:
#    admitted by train_step_supported only under the 64 MB scoped limit,
#    BENCH_NOTES "Raised scoped-VMEM limit"; ~75 s cold compile)
from vqvaehmm_tpu.ops.pallas_train import fused_loss_and_grads, train_step_supported
big = make_model(5, 256, 3, 128, u_dim=4, trans_hidden=256)
bparams = big.init(jax.random.PRNGKey(0))
xb = jnp.asarray(rng.normal(size=(64, 5, 200)).astype(np.float32))
ub = jnp.asarray(rng.normal(size=(64, 4, 200)).astype(np.float32))
lb = jnp.asarray(np.full(64, 200, np.int32))
assert train_step_supported(big.cfg, 64, 200)
loss, _ = fused_loss_and_grads(big, bparams, xb, ub, lb, 1.0)
ref_loss = big.compute_loss(bparams, xb, ub, lb, 1.0)
print("big-config fused train step loss reldiff:",
      abs(float(loss) - float(ref_loss)) / abs(float(ref_loss)),
      "(single-pass-dot rounding; interpret-mode math exact to 1.6e-6)")

print("ALL TPU KERNELS OK")
