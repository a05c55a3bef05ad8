#!/usr/bin/env python
"""Which accessible region does the DIS solution use, and how close is its
up-probability to th_ac=0.003? (knife-edge hypothesis for the golden-output
deviation: if Vienna's pf_unstru puts the wide stem-covering window just
BELOW th_ac, the extension candidates never exist and golden is forced)."""
import numpy as np
import jax.numpy as jnp

from ractip_tpu.evaluate.corpus import data_dir_default as _ddd
from ractip_tpu.io.fasta import load_fasta
from ractip_tpu.ops.accessibility import accessibility
from ractip_tpu.ops.seq import bucket_length, encode
from ractip_tpu.params.tables import get_default_params
from ractip_tpu.pipeline.ractip import Options, Posteriors, solve_pair
from ractip_tpu.solver import build_problem

_DATA = _ddd()
fa = load_fasta(_DATA + "/DIS.fa")[0]
params = get_default_params()
opts = Options()
cfg = opts.solver_cfg()
n = len(fa.seq)
L = bucket_length(n)
S = jnp.asarray(encode(fa.seq, L))
pu = np.asarray(accessibility(params, S, jnp.int32(n), cfg.max_w))
print("th_ac =", cfg.th_ac)
print("up for windows starting at p, width w (rows p=8..16, cols w=5..15):")
print("    " + " ".join(f"w={w:d}" for w in range(5, 16)))
for p in range(8, 17):
    row = " ".join(f"{pu[p, w]:.4f}"[1:] for w in range(5, 16))
    print(f"p={p:2d} {row}")

post = Posteriors(params, fa.seq, fa.seq, opts.max_w, True)
prob = build_problem(post.bpp1, post.bpp2, post.hp, post.pu1, post.pu2,
                     n, n, cfg)
from ractip_tpu.solver.milp import solve_joint_milp
u, obj, _, _ = solve_joint_milp(prob, cfg, L, L)
vp, vq, vm = (np.asarray(t) for t in (prob.vp, prob.vq, prob.vm))
sel = np.where((u[3] > 0.5) & (vm > 0))[0]
for k in sel:
    p_, q_ = int(vp[k]), int(vq[k])
    print(f"chosen v region: [{p_}, {q_}] width {q_ - p_ + 1} "
          f"up={pu[p_, q_ - p_ + 1]:.5f}")
wp, wq, wm = (np.asarray(t) for t in (prob.wp, prob.wq, prob.wm))
sel = np.where((u[4] > 0.5) & (wm > 0))[0]
for k in sel:
    p_, q_ = int(wp[k]), int(wq[k])
    print(f"chosen w region: [{p_}, {q_}] width {q_ - p_ + 1} "
          f"up={pu[p_, q_ - p_ + 1]:.5f}")
# and the golden window for comparison
print(f"golden-needed window [14,19] w=6: up={pu[14, 6]:.5f}")
