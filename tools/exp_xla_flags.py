"""XLA conv/layout flag sweep on the in-model flagship forward (VERDICT r4 #2c).

The round-5 trace shows ~27 ms/step of pure layout copies around the folded
stem/stage-1 convs (bf16[128,224,192,33] flipping between batch-on-lanes
{0,3,2,1} and spatial-minor {1,2,3,0} layouts) plus XLA's own space-to-batch
split fusions for the strided convs — this sweep probes whether a compiler
option moves those seams.

Channel note: client-side XLA_FLAGS do NOT reach the tunneled (axon) TPU
compiler — the local parser rejects every xla_tpu_* name (they live in the
server's libtpu). ``jax.jit(compiler_options=...)`` ships debug options
through PJRT to the server compiler and validates them there (a bogus name
errors), so each flag set is measured in ONE process as a separate
executable. Candidates were mined from `strings libtpu.so`.

Also sweeps NEXTOU_STAGE_FOLD (the stage-persistent fold that removes the
per-conv unfold relayouts at the stem — conv_blocks.py) since it attacks
the same seam from the model side.

Run on TPU: python tools/exp_xla_flags.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

FLAG_SETS = [
    ("baseline", {}),
    ("layout_negotiation", {"xla_tpu_allow_layout_negotiation": "true"}),
    ("aggressive_loop_fusion_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("fusion_layout_update", {"xla_tpu_enable_fusion_layout_update": "true"}),
    # CRASHES the TPU worker at these shapes (round-5 sweep) — keep last
    # or run isolated; a crashed worker poisons every later in-process point
    ("conv_pad_input_feature",
     {"xla_jf_conv_prefers_padding_input_feature": "true"}),
    ("input_conv_multi_users", {"xla_tpu_input_conv_multi_users": "true"}),
    ("copy_permute_minor_fusion",
     {"xla_tpu_enable_copy_permute_minor_fusion": "true"}),
    ("reverse_layout_order",
     {"xla_tpu_reverse_layout_computation_order": "true"}),
    ("copy_fusion", {"xla_tpu_enable_copy_fusion": "true",
                     "xla_tpu_copy_fusion_allow_split": "true"}),
    ("scavenge_vmem", {"xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("autotune_layouts", {"xla_tpu_autotune_layouts": "true"}),
    # model-side seam fixes measured with the same protocol: env points
    ("stage_fold", {"env": {"NEXTOU_STAGE_FOLD": "1"}}),
    ("pallas_s2", {"env": {"NEXTOU_PALLAS_CONV": "s2"}}),
    ("dec2d_strided", {"env": {"NEXTOU_DEC2D_STRIDED": "1"}}),
    ("dec2d_strided+stage_fold",
     {"env": {"NEXTOU_DEC2D_STRIDED": "1", "NEXTOU_STAGE_FOLD": "1"}}),
]


def run_point(name: str) -> None:
    opts = dict(FLAG_SETS)[name]
    env_overrides = opts.pop("env", None) if "env" in opts else None
    if env_overrides:
        os.environ.update(env_overrides)

    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.timing import device_loop_time
    from nextou_tpu.utils.transfer import device_put_variables

    spec = flagship_3d_spec(deep_supervision=False)
    B = 2
    x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    v = device_put_variables(fast_init(model, 0, x, train=False), jnp.bfloat16)
    jax.block_until_ready(v)

    def f(t):
        return model.apply(v, t, train=False)

    t = device_loop_time(
        f, x, n_small=2, n_large=10, repeats=3,
        compiler_options=opts or None,
    )
    print(f"RESULT_MS {t * 1e3:.2f}", flush=True)


def main():
    """Parent: one subprocess per point — a TPU-worker crash (e.g.
    conv_pad_input_feature) then only loses that point."""
    import subprocess

    names = (
        sys.argv[1].split(":")
        if len(sys.argv) > 1
        else [n for n, _ in FLAG_SETS]
    )
    results = {}
    for name in names:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--point", name],
                capture_output=True, text=True, timeout=1200,
            )
            ms = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT_MS"):
                    ms = float(line.split()[1])
            if ms is None:
                tail = (out.stdout + out.stderr).strip().splitlines()[-2:]
                results[name] = f"ERR rc={out.returncode}: {' | '.join(tail)[:160]}"
            else:
                results[name] = ms
        except subprocess.TimeoutExpired:
            results[name] = "TIMEOUT"
        print(f"{name:34s} {results[name]}", flush=True)

    print("\n==== summary (batch-2 flagship forward, ms) ====")
    for name, r in results.items():
        print(f"{name:34s} {r if isinstance(r, str) else f'{r:8.2f}'}")


if __name__ == "__main__":
    if "--point" in sys.argv:
        run_point(sys.argv[sys.argv.index("--point") + 1])
    else:
        main()
