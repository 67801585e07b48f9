"""Shear-warp BACKWARD ablation: where does fwd+bwd(1.78) - fwd(0.33) go?

Reuses exp_fastpath_profile's faithful _core reduction, measuring fwd+bwd
for each ablated variant (chained protocol, arrays as args).
Appends JSON to experiments/fastpath_profile_results.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp_fastpath_profile import build_core, OUT, V, PPV


def chain(f, args, n=2):
    c = f(jnp.float32(0.0), *args)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c, *args)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
    channels = jnp.concatenate([
        vol[None], jnp.gradient(vol)[0][None],
        jnp.gradient(vol)[1][None], jnp.gradient(vol)[2][None]])
    from differender_tpu.transfer import get_tf
    tf = jnp.asarray(np.asarray(get_tf("tf1", 128)))
    lf0 = np.array([0.15, 0.2, -2.4], np.float32)

    for variant in ["no_tf", "no_shade", "no_resample", "tf_dot"]:
        core = build_core(variant)

        @jax.jit
        def step(c, ch, t):
            def loss(ch_, t_):
                acc, T = core(ch_, t_, jnp.asarray(lf0), c)
                return jnp.mean(acc ** 2) + jnp.mean(T ** 2)
            g = jax.grad(loss, argnums=(0, 1))(ch, t)
            return c + 1 + g[0].sum() * 0 + g[1].sum() * 0

        try:
            s = chain(step, (channels, tf))
        except Exception as e:
            rec = {"variant": variant + "_fwd_bwd",
                   "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(rec), flush=True)
            continue
        rec = {"variant": variant + "_fwd_bwd", "fwd_bwd_s": round(s, 4),
               "per_slab_ms": round(s / (PPV * V) * 1e3, 4)}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
