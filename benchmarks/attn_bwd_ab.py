"""In-model step-time A/B for the Pallas window-attention backward.

Round-4 flipped the attention backward default to the Pallas kernel for
C<=512 on fp64 accuracy evidence (benchmarks/attn_bwd_truth_check.py);
the promised in-model throughput A/B never ran (TPU outage). This
script is that A/B, built for this host's measurement reality
(CLAUDE.md): one process, both variants compiled side by side, strictly
interleaved fenced chain timings so host steal hits both arms equally.

Arms (both the full b64 latent-32 train step, fwd+bwd+AdamW, donated
4-step lax.scan chains — the ldm_b64 unit from benchmarks/micro.py):
  default : LDM_ATTN_BWD unset -> Pallas backward at C=128/256/512,
            XLA VJP at C=1024 (the shipped default after 0d73744)
  xla     : LDM_ATTN_BWD=xla   -> XLA recompute VJP everywhere

The env var is read at TRACE time (kernels/window_attention.py:_bwd),
so each arm is traced under its own env setting; the two jitted chains
then coexist and the state ping-pongs through them alternately (the
step math is identical to float rounding, so arm order doesn't bias
the model state).

Output: one JSON line per arm + the verdict line used to keep or
revert the default.

Run (TPU, owns the chip): python benchmarks/attn_bwd_ab.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
from ldm_image_generator_tpu.utils.profiling import fence


def main():
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import UNet
    from ldm_image_generator_tpu.train import (
        LDMTrainState, make_ldm_train_step, make_optimizer,
    )

    key = jax.random.PRNGKey(0)
    batch, n = 64, 4
    unet = UNet(UNetConfig(), dtype=jnp.bfloat16)
    schedule = make_schedule(DDPMConfig())
    z32 = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    up = jax.jit(lambda k: unet.init({"params": k, "moe": k}, z32, t1))(key)
    tx = make_optimizer("adamw", 1e-4)
    step = make_ldm_train_step(unet, schedule, tx)
    xb = jax.random.normal(key, (batch, 32, 32, 8), jnp.float32)

    def make_chain(env_val):
        """Trace-time env decides the attention backward; a fresh
        function object per arm defeats the jit cache."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(state):
            def body(s, i):
                s, m = step(s, xb, jax.random.fold_in(key, i))
                return s, m["loss"]

            return jax.lax.scan(body, state, jnp.arange(n))

        return chain

    st = LDMTrainState(params=up, opt_state=tx.init(up),
                       step=jnp.zeros((), jnp.int32))
    del up

    arms = {}
    # trace/compile each arm under its env (trace-time read)
    for name, env in (("default", None), ("xla", "xla")):
        if env is None:
            os.environ.pop("LDM_ATTN_BWD", None)
        else:
            os.environ["LDM_ATTN_BWD"] = env
        chain = make_chain(env)
        t0 = time.perf_counter()
        st, out = chain(st)
        fence(out)
        print(f"# {name}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        arms[name] = chain

    times = {k: [] for k in arms}
    for trial in range(5):
        for name, chain in arms.items():
            t0 = time.perf_counter()
            st, out = chain(st)
            fence(out)
            times[name].append(time.perf_counter() - t0)

    med = lambda v: sorted(v)[len(v) // 2]
    per_step = {k: med(v) / n for k, v in times.items()}
    for k in arms:
        print(json.dumps({
            "metric": f"ldm_train_step_b64_attn_bwd_{k}",
            "value": round(per_step[k], 5), "unit": "s/step",
            "trials": [round(t / n, 5) for t in times[k]],
        }), flush=True)
    ratio = per_step["default"] / per_step["xla"]
    print(json.dumps({
        "metric": "attn_bwd_default_vs_xla_ratio",
        "value": round(ratio, 4),
        "verdict": "keep pallas default" if ratio <= 1.0
        else ("within noise — keep (accuracy wins)" if ratio <= 1.02
              else "REVERT: pallas backward slower in-model"),
    }), flush=True)


if __name__ == "__main__":
    main()
