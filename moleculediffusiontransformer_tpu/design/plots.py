"""Host-side plotting + molecule-drawing utilities (reference
`generative.py:554-561,627-634,932-1019,1740-1769`).  Entirely optional:
matplotlib/seaborn for curves and joint plots, RDKit for molecule renders
(gated — validity falls back to the syntactic checker when absent).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .inverse_design import HAS_RDKIT, smiles_is_valid


def plot_loss_curve(losses: Sequence[float], path: Optional[str] = None,
                    label: str = "loss"):
    """Loss-vs-step curve (reference `generative.py:554-561`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.plot(np.asarray(losses), label=label)
    ax.set_xlabel("step")
    ax.set_ylabel(label)
    ax.legend()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def joint_plot(ground_truth: np.ndarray, predictions: np.ndarray,
               path: Optional[str] = None):
    """Predicted-vs-GT seaborn jointplot (reference `generative.py:627-634`)."""
    import matplotlib
    matplotlib.use("Agg")
    import seaborn as sns
    g = sns.jointplot(x=np.asarray(ground_truth).ravel(),
                      y=np.asarray(predictions).ravel(), kind="scatter")
    g.set_axis_labels("ground truth", "prediction")
    if path:
        g.figure.savefig(path, dpi=120)
        import matplotlib.pyplot as plt
        plt.close(g.figure)
        return path
    return g


def plot_results_as_barchart(target: np.ndarray, predicted: np.ndarray,
                             property_names: Sequence[str],
                             path: Optional[str] = None):
    """Predicted-vs-target property bars (reference
    `plot_results_as_barchart`, `generative.py:1740-1769`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    target = np.asarray(target).ravel()
    predicted = np.asarray(predicted).ravel()
    n = len(property_names)
    x = np.arange(n)
    fig, ax = plt.subplots(figsize=(max(6, n * 0.8), 4))
    ax.bar(x - 0.2, target[:n], width=0.4, label="target")
    ax.bar(x + 0.2, predicted[:n], width=0.4, label="predicted")
    ax.set_xticks(x)
    ax.set_xticklabels(property_names, rotation=45, ha="right")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def draw_and_save(smiles: str, path: Optional[str] = None) -> bool:
    """Render a molecule; returns validity (reference `draw_and_save`,
    `generative.py:947-994` — validity = RDKit parse succeeds).  Without
    RDKit only the validity bool is produced (no image)."""
    if not HAS_RDKIT:
        return smiles_is_valid(smiles)
    from rdkit import Chem
    from rdkit.Chem import Draw
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return False
    if path:
        Draw.MolToFile(mol, path, size=(400, 400))
    return True


def draw_and_save_set(smiles_list: Sequence[str], prefix: str) -> List[bool]:
    """Render a set (reference `generative.py:996-1019`)."""
    return [draw_and_save(s, f"{prefix}_{i}.png" if HAS_RDKIT else None)
            for i, s in enumerate(smiles_list)]


def view_difference(smiles_a: str, smiles_b: str,
                    path: Optional[str] = None):
    """Highlight the maximum-common-substructure difference between two
    molecules (reference `view_difference`, `generative.py:932-945`).
    Requires RDKit."""
    if not HAS_RDKIT:
        raise ImportError("view_difference requires RDKit")
    from rdkit import Chem
    from rdkit.Chem import Draw, rdFMCS
    mol_a, mol_b = Chem.MolFromSmiles(smiles_a), Chem.MolFromSmiles(smiles_b)
    mcs = rdFMCS.FindMCS([mol_a, mol_b])
    pattern = Chem.MolFromSmarts(mcs.smartsString)
    hl_a = [i for i in range(mol_a.GetNumAtoms())
            if i not in mol_a.GetSubstructMatch(pattern)]
    hl_b = [i for i in range(mol_b.GetNumAtoms())
            if i not in mol_b.GetSubstructMatch(pattern)]
    img = Draw.MolsToGridImage([mol_a, mol_b],
                               highlightAtomLists=[hl_a, hl_b])
    if path:
        with open(path, "wb") as f:
            f.write(img.data if hasattr(img, "data") else img)
    return img
