#!/usr/bin/env python
"""Learner-side breakdown for the scale-SAC path (VERDICT r4 weak #3).

Mirrors bench.py's env-side breakdown for the *gradient* side: times, on the
real chip,
  - the SAC update alone (synthetic device-resident batch) over a batch-size
    sweep -> gradient updates/s + XLA flop/byte costs + MXU roofline,
  - the replay-buffer sample alone (the frame-stack gather) over the sweep,
  - sample+update chained under `lax.scan` (the production learn phase),
  - the env rollout segment of the off-policy iteration,
  - the full fused train step at the committed sac_tpu_scale_run.yml shape,
and writes one JSON report (artifacts/bench_r05_learner_breakdown.json).

The round-4 scale run claimed "learner-bound, ~25 updates/s" without a
measurement; this tool is the measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

V5E_PEAK_BF16_FLOPS = 1.97e14
V5E_PEAK_HBM_BYTES = 8.19e11


def _timed(fn, *a, iters=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    return min(ts)


def _cost(jitted, *a):
    try:
        an = jitted.lower(*a).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return {"flops": float(an.get("flops", 0.0)),
                "bytes": float(an.get("bytes accessed", 0.0))}
    except Exception as e:  # pragma: no cover
        return {"error": str(e)}


def synthetic_batch(key, b, fs=3, res=64):
    k1, k2, k3 = jax.random.split(key, 3)
    c = 3 * fs
    return dict(
        obs=jax.random.randint(k1, (b, c, res, res), 0, 255, jnp.uint8),
        next_obs=jax.random.randint(k2, (b, c, res, res), 0, 255, jnp.uint8),
        action=jax.random.uniform(k3, (b, 2), minval=-1.0, maxval=1.0),
        reward=jnp.ones((b,)),
        discount_mask=jnp.ones((b,)),
        done=jnp.zeros((b,), bool),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=128)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--updates_per_iter", type=int, default=32)
    ap.add_argument("--steps_per_iter", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=512,
                    help="production batch for the fused/chained sections")
    ap.add_argument("--out", default="artifacts/bench_r05_learner_breakdown.json")
    args = ap.parse_args()

    from torchdriveenv_tpu.config import EnvConfig
    from torchdriveenv_tpu.maps.arrays import load_assets
    from torchdriveenv_tpu.rl import buffer as replay
    from torchdriveenv_tpu.rl.sac import SAC, SACConfig

    print(f"devices: {jax.devices()}", file=sys.stderr)
    report = {"device": str(jax.devices()[0]), "num_envs": args.num_envs}
    key = jax.random.PRNGKey(0)
    fs, res = 3, 64

    # ---- 1. update alone, batch sweep
    sweep = {}
    for b in args.batches:
        agent = SAC(SACConfig(batch_size=b), obs_channels=3 * fs)
        state = agent.init(key, obs_res=res)
        batch = synthetic_batch(key, b, fs, res)
        upd = jax.jit(lambda s, ba, k: agent.update(s, ba, k))
        t = _timed(lambda s=state: upd(s, batch, key)[0], iters=8)
        cost = _cost(upd, state, batch, key)
        row = {"ms": t * 1e3, "updates_per_s": 1.0 / t,
               "samples_per_s": b / t, "cost": cost}
        if "flops" in cost:
            row["mxu_util_vs_bf16_peak"] = (
                cost["flops"] / t / V5E_PEAK_BF16_FLOPS)
            row["hbm_bw_util"] = cost["bytes"] / t / V5E_PEAK_HBM_BYTES
        sweep[b] = row
        print(f"update b={b}: {t*1e3:.2f} ms "
              f"({1/t:.1f} upd/s, {b/t:.0f} samp/s)", file=sys.stderr)
    report["update_sweep"] = sweep

    # ---- 2. replay sample alone (production buffer shape)
    cap = max(SACConfig().buffer_size // args.num_envs, 256)
    buf = replay.create(args.num_envs, cap, (3, res, res))
    # mark the buffer as full so sampling spans the whole ring
    buf = buf.replace(pos=jnp.asarray(cap, jnp.int32),
                      filled=jnp.asarray(cap, jnp.int32))
    samp_sweep = {}
    for b in args.batches:
        samp = jax.jit(lambda bf, k, bb=b: replay.sample(bf, k, bb, fs))
        t = _timed(samp, buf, key, iters=8)
        samp_sweep[b] = {"ms": t * 1e3, "samples_per_s": b / t}
        print(f"sample b={b}: {t*1e3:.2f} ms", file=sys.stderr)
    report["sample_sweep"] = samp_sweep
    report["buffer"] = {"capacity_per_env": cap, "envs": args.num_envs}

    # ---- 3. chained sample+update x updates_per_iter (the learn phase)
    b = args.batch_size
    agent = SAC(SACConfig(batch_size=b), obs_channels=3 * fs)
    state = agent.init(key, obs_res=res)

    def learn_phase(state, bf, k):
        def one(s, kk):
            k1, k2 = jax.random.split(kk)
            batch = replay.sample(bf, k1, b, fs)
            s, m = agent.update(s, batch, k2)
            return s, m["critic_loss"]
        keys = jax.random.split(k, args.updates_per_iter)
        return jax.lax.scan(one, state, keys)

    learn_j = jax.jit(learn_phase)
    # block on the FULL output (state + losses): timing only the loss
    # element under-measures on this backend
    t_learn = _timed(lambda: learn_j(state, buf, key), iters=4)
    report["learn_phase"] = {
        "updates_per_iter": args.updates_per_iter, "batch_size": b,
        "ms": t_learn * 1e3,
        "updates_per_s": args.updates_per_iter / t_learn,
    }
    print(f"learn phase ({args.updates_per_iter}x b={b}): "
          f"{t_learn*1e3:.1f} ms -> "
          f"{args.updates_per_iter/t_learn:.1f} upd/s", file=sys.stderr)

    # ---- 4. env rollout segment (steps_per_iter lockstep steps, with render
    # + buffer add, as in the off-policy train step)
    from torchdriveenv_tpu.env.batched import make_env_fns
    cfg = EnvConfig()
    assets = load_assets("train")
    reset_fn, step_fn = make_env_fns(cfg, assets, render=True,
                                     with_final_obs=True)
    env_state, obs = jax.jit(reset_fn)(
        jax.random.split(key, args.num_envs))

    def roll(env_state, buf, k):
        def one(c, kk):
            es, bf = c
            a = jax.random.uniform(kk, (args.num_envs, 2),
                                   minval=-1.0, maxval=1.0)
            out = step_fn(es, a)
            bf = replay.add(bf, out.obs, a, out.reward,
                            out.terminated | out.truncated,
                            out.terminated, out.final_obs)
            return (out.state, bf), out.reward.sum()
        keys = jax.random.split(k, args.steps_per_iter)
        (es, bf), r = jax.lax.scan(one, (env_state, buf), keys)
        return es, bf, r

    roll_j = jax.jit(roll, donate_argnums=(1,))
    import copy
    t_roll = _timed(lambda: roll_j(env_state,
                                   replay.create(args.num_envs, cap,
                                                 (3, res, res)), key),
                    iters=4)
    report["rollout_phase"] = {
        "steps_per_iter": args.steps_per_iter,
        "ms": t_roll * 1e3,
        "env_steps_per_s": args.steps_per_iter * args.num_envs / t_roll,
    }
    print(f"rollout phase ({args.steps_per_iter} steps x {args.num_envs} "
          f"envs): {t_roll*1e3:.1f} ms", file=sys.stderr)

    # ---- 5. full fused production train step
    from torchdriveenv_tpu.parallel.train_step import make_offpolicy_train_fns
    init_fn, train_fn = make_offpolicy_train_fns(
        cfg, agent, args.num_envs, buffer_capacity=cap,
        steps_per_iter=args.steps_per_iter,
        updates_per_iter=args.updates_per_iter)
    carry = jax.jit(init_fn)(assets, key)
    # push past warmup so the learn branch actually runs
    carry = carry.replace(env_steps=jnp.asarray(10_000, jnp.int32))
    train_j = jax.jit(train_fn, donate_argnums=(1,))
    carry, _ = jax.block_until_ready(train_j(assets, carry))
    ts = []
    for _ in range(4):
        t0 = time.time()
        carry, _ = jax.block_until_ready(train_j(assets, carry))
        ts.append(time.time() - t0)
    t_full = min(ts)
    spi = args.steps_per_iter * args.num_envs
    report["fused_train_step"] = {
        "ms": t_full * 1e3,
        "env_steps_per_iter": spi,
        "env_steps_per_s": spi / t_full,
        "updates_per_s": args.updates_per_iter / t_full,
    }
    print(f"fused train step: {t_full*1e3:.1f} ms -> "
          f"{spi/t_full:.0f} env-steps/s, "
          f"{args.updates_per_iter/t_full:.1f} upd/s", file=sys.stderr)

    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
