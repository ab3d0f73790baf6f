"""Text conditioning: lazy HuggingFace T5 encoder
(reference `T5Embedder`, `modules.py:1329-1359`).

Host-side preprocessing component: tokenizes text and returns frozen T5
hidden states as conditioning embeddings (the QM9 flow never uses it; kept
for API parity with the audio-conditional models).  The HF model loads
lazily and runs on CPU via its own framework; outputs come back as jnp
arrays for the UNet's cross-attention.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class T5Embedder:
    """Frozen T5 text encoder -> (b, max_length, hidden) embeddings."""

    def __init__(self, model: str = "t5-base", max_length: int = 64):
        self.model_name = model
        self.max_length = max_length
        self._tokenizer = None
        self._transformer = None

    def _load(self):
        if self._transformer is None:
            from transformers import AutoTokenizer, T5EncoderModel
            self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
            self._transformer = T5EncoderModel.from_pretrained(
                self.model_name)
            self._transformer.eval()

    def __call__(self, texts: List[str]) -> jnp.ndarray:
        import torch
        self._load()
        encoded = self._tokenizer(texts, truncation=True,
                                  max_length=self.max_length,
                                  padding="max_length", return_tensors="pt")
        with torch.no_grad():
            hidden = self._transformer(
                input_ids=encoded["input_ids"],
                attention_mask=encoded["attention_mask"])["last_hidden_state"]
        return jnp.asarray(hidden.cpu().numpy())
