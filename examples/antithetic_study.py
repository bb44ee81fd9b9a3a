"""Antithetic-pair correlation study on a generated dataset.

Reproduces docs/antithetic_study.md: per-config corr(I(z), I(-z)) and
the implied sample-count ratio of a pair-level empirical-variance Wald
criterion vs the shipped independent-sample criterion, stratified by
label bin and budget-weighted over the dataset's distribution.

Usage: python examples/antithetic_study.py [data_dir]   (default
/tmp/prod/data — the round-4/5 production dataset location). CPU-safe.
"""
import json
import sys
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from collide2d_tpu.ops.sat import obb_collide

data = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prod/data"
# Dataset rows (x, y, cp, var_idx, pose_idx) + the config tables
rows = np.load(f"{data}/0.npy")
poses = np.load(f"{data}/poses.npy")          # (P, 3): w, h, theta
variances = np.load(f"{data}/variances.npy")  # (V, 5)
cp = rows[:, 2]
# stratified pick: emphasize the budget-heavy bins
idx = []
rng = np.random.default_rng(0)
for lo, hi, n in ((1e-9, 0.01, 1536), (0.01, 0.1, 1024), (0.1, 1.0, 1024), (-1, 1e-9, 512)):
    cand = np.flatnonzero((cp > lo) & (cp <= hi))
    idx.append(rng.choice(cand, size=min(n, len(cand)), replace=False))
idx = np.concatenate(idx)
r = rows[idx]
pose = poses[r[:, 4].astype(np.int64)]
var = variances[r[:, 3].astype(np.int64)]
C = len(idx)
pos = jnp.asarray(r[:, 0:2]); th = jnp.asarray(pose[:, 2])
wh = jnp.asarray(pose[:, 0:2]); sd = jnp.asarray(var)
ROBOT = jnp.asarray([4.07, 1.74], jnp.float32)

S = 16384  # pairs per config
@jax.jit
def stats(key):
    def one(c_pos, c_th, c_wh, c_sd, k):
        z = jax.random.normal(k, (S, 5), jnp.float32)
        def hits(zz):
            d = zz * c_sd[None]
            return obb_collide(c_pos[None], ROBOT[None], c_th[None],
                               d[:, 0:2], c_wh[None] + d[:, 3:5], d[:, 2])
        ip, im = hits(z), hits(-z)
        return (jnp.sum(ip) + jnp.sum(im), jnp.sum(ip & im),
                jnp.sum(ip ^ im))
    keys = jax.random.split(key, C)
    return jax.vmap(one)(pos, th, wh, sd, keys)

k_tot, both, mixed = [np.array(x) for x in stats(jax.random.PRNGKey(7))]
n_tot = 2 * S
p = k_tot / n_tot
# pair mean variance: m in {0,.5,1}; a=both, b=mixed, c=S-a-b
a, b = both, mixed
m_mean = (2*a + b) / (2*S)
s2 = (a*(1-m_mean)**2 + b*(0.5-m_mean)**2 + (S-a-b)*m_mean**2) / np.maximum(S-1, 1)
# effective variance per SINGLE sample under pairing: var(p_hat over n samples)
# = s2 / n_pairs = 2*s2/n  => n_antithetic needed = (2*s2) / (acc/z)^2
# independent: n_indep = p(1-p) / (acc/z)^2
rho = np.where(p*(1-p) > 0, (both/S - p**2) / np.where(p*(1-p)>0, p*(1-p), 1), 0.0)
bins = np.digitize(p, [0.01, 0.1])
acc = np.array([1e-4, 1e-3, 1e-2])[bins]
zq = 1.96
n_indep = np.maximum(zq**2 * p*(1-p) / acc**2, np.log(40)/acc)
n_anti  = np.maximum(zq**2 * 2*s2 / acc**2, np.log(40)/acc)   # rule-of-three floor unchanged
ratio = n_anti / np.maximum(n_indep, 1)
out = {
    "C": int(C), "S_pairs": S,
    "rho_mean_by_bin": {},
    "n_ratio_by_bin": {},
}
for bi, name in ((0, "lo(0,.01]"), (1, "mid(.01,.1]"), (2, "hi(.1,1]")):
    m = (bins == bi) & (p > 0) & (p < 1)
    if m.sum():
        out["rho_mean_by_bin"][name] = round(float(rho[m].mean()), 4)
        out["n_ratio_by_bin"][name] = round(float(np.average(ratio[m], weights=n_indep[m])), 4)
# overall budget ratio over the PRODUCTION distribution: weight each config by its n
w = n_indep
out["budget_ratio_sample_counts"] = round(float((n_anti.sum()) / n_indep.sum()), 4)
out["frac_rho_positive"] = round(float((rho > 0.02).mean()), 4)
print(json.dumps(out, indent=1))
