"""Measure the PyTorch reference's CPU throughput for the two BASELINE
metrics, at the exact architecture `bench.py` runs (BASELINE.json configs[0]:
cfg UNet channels=64, pred_dim=16, max_length=64 — the README "basic setup",
reference `README.md:100-135` / `generative.py:718-830`):

  1. 64-step CFG ADPM2 sampling, batch 16 (the sampling north-star);
  2. one Adam train step (K-diffusion loss, grad-clip 0.5), batch 16
     (the train-throughput metric; reference loop `generative.py:1127-1134`).

Prints one JSON line per metric.  The numbers feed `bench.py`'s
TORCH_CPU_MOL_PER_S / TORCH_CPU_TRAIN_SAMPLES_PER_S constants — rerun this
script to regenerate them on any machine:

    python tools/measure_torch_baseline.py [--batch 16] [--steps 64] [--reps 3]

Loads the reference torch package from /root/reference as a numerical
oracle only (same mechanics as tests/conftest.py) — never as source.
"""
import argparse
import importlib.util
import json
import os
import sys
import time
import types

_REF_ROOT = "/root/reference/MoleculeDiffusion"


def _load_reference():
    """Reference modules as a synthetic package, bypassing its __init__
    (which drags in torchvision/tensorflow); transformer.py needs
    torch_geometric/torchvision stubs (only imported, never used by the
    positional-encoding class we need)."""
    if "refmd" in sys.modules:
        return sys.modules["refmd"]
    pkg = types.ModuleType("refmd")
    pkg.__path__ = [_REF_ROOT]
    sys.modules["refmd"] = pkg
    for name, subs in (("torchvision", ["transforms"]),
                       ("torch_geometric", ["nn", "utils"])):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = []
            sys.modules[name] = stub
            for sub in subs:
                mod = types.ModuleType(f"{name}.{sub}")
                for attr in ("GCNConv", "GraphConv", "global_mean_pool",
                             "to_edge_index", "dense_to_sparse"):
                    setattr(mod, attr, object())
                sys.modules[f"{name}.{sub}"] = mod
                setattr(stub, sub, mod)
    for name in ("utils", "diffusion", "modules", "transformer"):
        spec = importlib.util.spec_from_file_location(
            f"refmd.{name}", os.path.join(_REF_ROOT, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmd.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def build_model(ref, pred_dim=16, max_length=64, channels=64):
    """Reference QMDiffusion assembly (`generative.py:718-830`, 'cfg'
    branch).  Defaults = the bench architecture; ``--flagship`` switches to
    the Inverse_Diffusion notebook preset (pred_dim=22, max_length=32,
    channels=128 — 90,965,554 params)."""
    import torch.nn as nn
    md, mm, tr = ref.diffusion, ref.modules, ref.transformer

    class RefQMDiffusion(nn.Module):
        def __init__(self):
            super().__init__()
            self.pred_dim, self.max_length = pred_dim, max_length
            self.fc1 = nn.Linear(1, 64)
            self.GELUact = nn.GELU()
            self.p_enc_1d = tr.PositionalEncoding1D(64)
            self.unet = mm.XUNet1d(
                type="cfg", in_channels=pred_dim, pre_transformer=2,
                channels=channels, patch_size=1, multipliers=[1, 2, 4],
                factors=[4, 4], num_blocks=[3, 3], attentions=[4, 4],
                attention_heads=8, attention_features=64,
                attention_multiplier=2, attention_use_rel_pos=False,
                context_embedding_features=128,
                context_embedding_max_length=12)
            self.diffusion = md.XDiffusion_x(
                type="k", net=self.unet,
                sigma_distribution=md.LogNormalDistribution(-1.2, 1.2),
                sigma_data=0.1, dynamic_threshold=0.0)

        def embed(self, props):
            x = self.GELUact(self.fc1(props.float().unsqueeze(2)))
            return __import__("torch").cat((x, self.p_enc_1d(x)), 2)

    return RefQMDiffusion()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--flagship", action="store_true",
                    help="measure the 91M Inverse_Diffusion preset instead "
                         "of the bench architecture")
    args = ap.parse_args()

    import torch
    torch.manual_seed(0)
    ref = _load_reference()
    md = ref.diffusion
    if args.flagship:
        model = build_model(ref, pred_dim=22, max_length=32, channels=128)
    else:
        model = build_model(ref)
    tag = "torch_cpu_flagship" if args.flagship else "torch_cpu"
    n_params = sum(p.numel() for p in model.parameters())

    props = torch.rand(args.batch, 12) * 2 - 1

    # --- metric 1: 64-step CFG ADPM2 sampling (generative.py:834-870) ---
    model.eval()
    def sample_once():
        with torch.no_grad():
            emb = model.embed(props)
            noise = torch.randn(args.batch, model.pred_dim,
                                model.max_length)
            return model.diffusion.sample(
                num_steps=args.steps, sampler=md.ADPM2Sampler(rho=1),
                sigma_schedule=md.KarrasSchedule(
                    sigma_min=0.001, sigma_max=9.0, rho=3.),
                clamp=False, noise=noise, embedding=emb,
                embedding_scale=2.0)

    sample_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.reps):
        sample_once()
    dt = (time.perf_counter() - t0) / args.reps
    mol_per_s = args.batch / dt
    print(json.dumps({
        "metric": f"{tag}_cfg64_sampling", "value": round(mol_per_s, 4),
        "unit": "molecules/s", "batch": args.batch, "num_steps": args.steps,
        "params": n_params, "torch": torch.__version__}))

    # --- metric 2: train step (generative.py:1127-1134 mechanics) -------
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)
    x = torch.randn(args.batch, model.pred_dim, model.max_length)

    def train_step():
        opt.zero_grad()
        loss = model.diffusion(x, embedding=model.embed(props))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
        opt.step()

    train_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.reps):
        train_step()
    dt = (time.perf_counter() - t0) / args.reps
    print(json.dumps({
        "metric": f"{tag}_train_step", "value": round(args.batch / dt, 4),
        "unit": "samples/s", "batch": args.batch, "params": n_params,
        "torch": torch.__version__}))


if __name__ == "__main__":
    main()
