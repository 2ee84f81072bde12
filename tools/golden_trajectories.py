"""Golden seeded-trajectory harness (BASELINE.md correctness north star).

Drives fixed action sequences through each of the 5 validation scenarios
(reference data/validation_cases.yml; README.md:15-27) in ego-only,
no-render mode with a pinned PRNG key, and records the full ego state
trajectory, per-step rewards, and termination flags. The committed golden
file (torchdriveenv_tpu/assets/golden_trajectories_v1.npz) pins the engine's
step semantics — kinematic bicycle discretization (ops/bicycle.py,
`beta = atan(0.5 tan(steer))`, explicit Euler — the documented tds
assumption), waypoint advance at 3 m, reward coefficients, termination —
so any regression or intentional change (e.g. dialing bicycle_beta_factor
to the verified tds value) shows up as a golden diff that must be
explicitly re-recorded.

Reference semantics being pinned: gym_env.py:245-247 (KinematicBicycle),
:369-437 (step/reward/termination).

Usage:
    python tools/golden_trajectories.py record   # overwrite the golden file
    python tools/golden_trajectories.py check    # compare current engine
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if __name__ == "__main__" and "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from torchdriveenv_tpu.config import EnvConfig  # noqa: E402
from torchdriveenv_tpu.env import core  # noqa: E402
from torchdriveenv_tpu.maps.arrays import load_assets  # noqa: E402

N_STEPS = 60
SEED = 7


def action_sequences():
    """Three fixed (N_STEPS, 2) action scripts per case: cruise straight,
    sinusoidal weave, accelerate-then-brake."""
    t = np.arange(N_STEPS, dtype=np.float32)
    cruise = np.stack([np.full_like(t, 0.6), np.zeros_like(t)], -1)
    weave = np.stack([np.full_like(t, 0.3),
                      0.12 * np.sin(t / 5.0)], -1)
    brake = np.stack([np.where(t < 30, 1.0, -1.0), np.full_like(t, 0.02)], -1)
    return {"cruise": cruise, "weave": weave, "brake": brake}


def rollout(cfg: EnvConfig, assets, case: int, actions: np.ndarray):
    """Seeded ego-only rollout of a fixed action script through one case."""
    key = jax.random.PRNGKey(SEED + case)

    def run(key, acts):
        state = core.reset(cfg, assets, key, case=jnp.asarray(case))

        def one(state, a):
            nxt, r, term, trunc, _ = core.step(cfg, assets, state, a)
            return nxt, (nxt.agent_states[0], r, term, trunc,
                         nxt.target_idx)

        _, (ego, r, term, trunc, tgt) = jax.lax.scan(one, state, acts)
        return ego, r, term, trunc, tgt

    ego, r, term, trunc, tgt = jax.jit(run)(key, jnp.asarray(actions))
    return dict(ego=np.asarray(ego), reward=np.asarray(r),
                terminated=np.asarray(term), truncated=np.asarray(trunc),
                target_idx=np.asarray(tgt))


def compute_all():
    cfg = EnvConfig(ego_only=True, seed=SEED)
    assets = load_assets("val")
    out = {}
    for case in range(5):
        for name, acts in action_sequences().items():
            tr = rollout(cfg, assets, case, acts)
            for k, v in tr.items():
                out[f"case{case}_{name}_{k}"] = v
    return out


def golden_path() -> str:
    import torchdriveenv_tpu
    return os.path.join(torchdriveenv_tpu._data_path[0],
                        "golden_trajectories_v1.npz")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    cur = compute_all()
    if mode == "record":
        np.savez_compressed(golden_path(), **cur)
        print(f"recorded {len(cur)} arrays -> {golden_path()}")
        return
    gold = np.load(golden_path())
    bad = 0
    for k in gold.files:
        g, c = gold[k], cur[k]
        if g.dtype == bool:
            ok = bool((g == c).all())
        else:
            ok = bool(np.allclose(g, c, atol=1e-4, rtol=1e-5))
        if not ok:
            bad += 1
            err = np.abs(g.astype(np.float64) - c.astype(np.float64)).max()
            print(f"MISMATCH {k}: max |diff| = {err}")
    print(f"{len(gold.files) - bad}/{len(gold.files)} golden arrays match")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
