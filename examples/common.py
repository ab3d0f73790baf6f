"""Shared plumbing for the example scripts (the rebuild of the reference's
four notebook entry points)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--csv", default=None,
                   help="path to qm9_.csv (reference dataset); synthetic "
                        "stand-in when omitted")
    p.add_argument("--rows", type=int, default=None,
                   help="cap dataset rows (full CSV when omitted)")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="scale the model down for smoke runs")
    return p


def load_dataset(args, mode: str, max_length=None):
    from moleculediffusiontransformer_tpu.data.qm9 import (load_qm9,
                                                           prepare_qm9,
                                                           synthetic_qm9)
    if args.csv:
        smiles, props = load_qm9(args.csv, max_rows=args.rows)
    else:
        # chemically_valid: valence-correct molecules so the printed
        # validity/novelty numbers carry meaning (design/valence.py)
        smiles, props = synthetic_qm9(n=args.rows or 2048, seed=args.seed,
                                      chemically_valid=True)
        print("NOTE: using the synthetic QM9 stand-in (pass --csv for the "
              "real dataset)")
    return prepare_qm9(smiles, props, mode=mode, max_length=max_length)


def epoch_iterator(data, batch_size: int, seed: int):
    from moleculediffusiontransformer_tpu.data.qm9 import batch_iterator

    def make():
        return batch_iterator(data.X_train, data.y_train, batch_size,
                              rng=np.random.RandomState(seed))
    return make
