"""North-star benchmark: 64-step CFG ADPM2 sampling throughput on the
inverse QM diffusion model (BASELINE.json configs[0]: cfg UNet channels=64,
pred_dim=16, max_length=64 — the README "basic setup").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the PyTorch reference on this machine's CPU measured with the
identical architecture/sampler/steps (see tools/measure_torch_baseline.py):
batch 16, 64 ADPM2 steps (2 denoise evals/step x 2 CFG passes = 256 UNet
forwards per molecule) — recorded below as TORCH_CPU_MOL_PER_S.

Ours runs the whole 64-step CFG sampler as one jitted lax.scan with batched
CFG (128 doubled-batch UNet evals total), bf16 compute on TPU.
"""
import json
import time

import jax
import jax.numpy as jnp

# torch CPU reference throughput, measured on this machine (see module
# docstring); updated whenever re-measured.
TORCH_CPU_MOL_PER_S = 0.3801  # molecules/s, batch 16, 64-step CFG sampling

BATCH = 256
NUM_STEPS = 64


def main():
    from moleculediffusiontransformer_tpu.models import QMDiffusion, sample

    model = QMDiffusion(
        max_length=64, channels=64, pred_dim=16, text_embed_dim=64,
        embed_dim_position=64, context_embedding_max_length=12,
        multipliers=(1, 2, 4), factors=(4, 4), num_blocks=(3, 3),
        attentions=(4, 4), attention_heads=8, attention_features=64,
        attention_multiplier=2, pre_transformer=2, patch_size=1,
        dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    props = jax.random.uniform(key, (BATCH, 12), minval=-1.0, maxval=1.0)
    target = jnp.zeros((2, model.max_length, model.pred_dim))
    variables = jax.jit(model.init)(key, props[:2], target, key)

    def run(k):
        return sample(model, variables, props, k, num_steps=NUM_STEPS,
                      cond_scale=2.0)

    # NOTE: on the tunneled TPU backend block_until_ready() returns before
    # execution completes; a device-side reduction + scalar transfer is the
    # only honest sync.  Per-call RPC overhead (~33 ms) is amortized inside
    # the single jitted scan.
    sumf = jax.jit(jnp.sum)
    out = run(jax.random.PRNGKey(1))
    sanity = float(sumf(out))
    assert jnp.isfinite(sanity), sanity

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        float(sumf(run(jax.random.PRNGKey(2 + i))))
    dt = (time.perf_counter() - t0) / reps

    mol_per_s = BATCH / dt
    print(json.dumps({
        "metric": "inverse_qm_diffusion_cfg64_sampling",
        "value": round(mol_per_s, 3),
        "unit": "molecules/s",
        "vs_baseline": round(mol_per_s / TORCH_CPU_MOL_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
