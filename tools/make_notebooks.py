"""Generate the notebook-form entry points (notebooks/*.ipynb).

The reference's de-facto UX is five notebooks (Forward_Diffusion.ipynb
etc.); this repo's equivalents are the CLI example scripts
(examples/*.py).  This tool emits a notebook per example — markdown
front-matter from the example's own docstring, a smoke-scale run cell,
and the full-scale commands — plus a cell-by-cell quickstart notebook
that walks the train -> sample -> evaluate flow interactively.

Deterministic output (no timestamps/ids), so the notebooks are committed
and regenerable:  python tools/make_notebooks.py
"""
import ast
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "notebooks")

# (example module, notebook name, reference notebook it rebuilds)
EXAMPLES = [
    ("forward_diffusion", "Forward_Diffusion",
     "Forward_Diffusion.ipynb"),
    ("inverse_diffusion", "Inverse_Diffusion",
     "Inverse_Diffusion.ipynb"),
    ("forward_transformer", "Forward_Transformer",
     "Forward_Transformer.ipynb"),
    ("inverse_transformer", "Inverse_Transformer",
     "Inverse_Transformer.ipynb"),
    ("simple_models", "Simple_Models",
     "Simple examples of basic models.ipynb"),
    ("audio_diffusion", "Audio_Diffusion",
     "(audio lineage, reference model.py)"),
]


def md(source: str) -> dict:
    return {"cell_type": "markdown", "metadata": {},
            "source": source.splitlines(keepends=True)}


def code(source: str) -> dict:
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": source.splitlines(keepends=True)}


def notebook(cells) -> dict:
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def write(name: str, nb: dict) -> None:
    path = os.path.join(OUT, name + ".ipynb")
    with open(path, "w") as f:
        json.dump(nb, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote", os.path.relpath(path, REPO))


def example_docstring(module: str) -> str:
    src = open(os.path.join(REPO, "examples", module + ".py")).read()
    return ast.get_docstring(ast.parse(src)) or ""


def example_notebook(module: str, title: str, ref: str) -> dict:
    doc = example_docstring(module)
    cells = [
        md(f"# {title}\n\n"
           f"TPU-native rebuild of the reference notebook **{ref}**.\n\n"
           f"The implementation lives in `examples/{module}.py` (and the\n"
           f"`moleculediffusiontransformer_tpu` package it drives); this\n"
           f"notebook is the interactive surface over it.\n\n"
           "```\n" + doc + "\n```"),
        code("import os, sys\n"
             "REPO = os.path.abspath('..')\n"
             "sys.path.insert(0, REPO)\n"
             "sys.path.insert(0, os.path.join(REPO, 'examples'))\n"
             "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
             " '/tmp/jax_cache')"),
        md("## Smoke-scale run\n\nTiny model, synthetic QM9 stand-in — "
           "finishes in minutes on CPU or one TPU chip. Edit the argv "
           "list like you would the CLI flags."),
        code(f"import {module} as example\n"
             + ("sys.argv = ['nb', '--tiny', '--epochs', '2']\n"
                if module not in ("simple_models", "audio_diffusion")
                else "sys.argv = ['nb']\n")
             + "example.main()"),
        md("## Full scale\n\nThe notebook-preset run (TPU; pass the real "
           "dataset when available):\n\n"
           f"```bash\npython examples/{module}.py --csv qm9_.csv "
           "--epochs 300 --checkpoint-dir ckpts/\n```\n\n"
           "See `examples/README.md` for the flag reference and measured "
           "training numbers, and `docs/MIGRATION.md` if you are coming "
           "from the torch reference."),
    ]
    return notebook(cells)


QUICKSTART_CELLS = [
    md("# Quickstart: train → sample → evaluate\n\n"
       "The inverse-design flow (12 QM9 properties → SMILES) cell by "
       "cell at toy scale — the interactive equivalent of the reference's "
       "Inverse_Diffusion.ipynb core loop, on the TPU-native stack."),
    code("import os, sys\n"
         "sys.path.insert(0, os.path.abspath('..'))\n"
         "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
         " '/tmp/jax_cache')\n"
         "import jax, jax.numpy as jnp, numpy as np\n"
         "print(jax.devices())"),
    md("## Data\n\nSynthetic QM9 stand-in (chemically valid mode); swap "
       "in `load_qm9('qm9_.csv')` for the real set."),
    code("from moleculediffusiontransformer_tpu.data.qm9 import "
         "synthetic_qm9, prepare_qm9\n"
         "smiles, props = synthetic_qm9(512, seed=1, "
         "chemically_valid=True)\n"
         "data = prepare_qm9(smiles, props, mode='inverse_diffusion', "
         "max_length=16)\n"
         "data.X_train.shape, data.y_train.shape, data.vocab_size"),
    md("## Model\n\nA tiny `QMDiffusion` (the notebook preset is "
       "`core.config.inverse_diffusion_qm9()` — 91M params)."),
    code("from moleculediffusiontransformer_tpu.models import "
         "QMDiffusion, sample\n"
         "model = QMDiffusion(max_length=16, channels=16, "
         "pred_dim=data.vocab_size,\n"
         "                    text_embed_dim=16, embed_dim_position=8,\n"
         "                    context_embedding_max_length=12, "
         "multipliers=(1, 2),\n"
         "                    factors=(2,), num_blocks=(1,), "
         "attentions=(1,),\n"
         "                    attention_heads=2, attention_features=8,\n"
         "                    pre_transformer=1, patch_size=1)\n"
         "key = jax.random.PRNGKey(0)\n"
         "X = jnp.asarray(data.X_train[:32]); "
         "y = jnp.asarray(data.y_train[:32])\n"
         "variables = jax.jit(model.init)(key, y, X, key)"),
    md("## Train\n\nThe production jitted step (Adam 2e-4 + grad-clip "
       "0.5, the reference's recipe). Loss must fall."),
    code("from moleculediffusiontransformer_tpu.core.config import "
         "TrainConfig\n"
         "from moleculediffusiontransformer_tpu.train import ("
         "TrainState, make_optimizer, make_diffusion_train_step)\n"
         "tx = make_optimizer(TrainConfig(learning_rate=1e-3))\n"
         "state = TrainState.create(variables['params'], tx)\n"
         "step = make_diffusion_train_step(model, tx, donate=False)\n"
         "for i in range(20):\n"
         "    state, loss = step(state, y, X, key)\n"
         "    if i % 5 == 0: print(i, float(loss))"),
    md("## Sample + evaluate\n\n64-step CFG sampling, decode to SMILES, "
       "validity/novelty report (valence-aware checker when RDKit is "
       "absent)."),
    code("from moleculediffusiontransformer_tpu.design import ("
         "decode_one_hot, evaluate_generated)\n"
         "out = sample(model, {'params': state.params}, y[:8], key,\n"
         "             num_steps=64, cond_scale=2.0)\n"
         "gen = decode_one_hot(np.asarray(out), data.tokenizer)\n"
         "evaluate_generated(gen, data.smiles)"),
    md("## Scale up\n\n- notebook preset: "
       "`from_config(QMDiffusion, inverse_diffusion_qm9(vocab))`\n"
       "- data-parallel mesh: `parallel.make_mesh(8)` + "
       "`train_diffusion(..., mesh=mesh)`\n"
       "- AOT serving: `tools/export_serving_artifact.py` then "
       "`python -m moleculediffusiontransformer_tpu serve art.mdtx "
       "--http 8000`\n"
       "- the whole quality table: `tools/reproduce_baseline.py`"),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for module, title, ref in EXAMPLES:
        write(title, example_notebook(module, title, ref))
    write("Quickstart", notebook(QUICKSTART_CELLS))


if __name__ == "__main__":
    main()
