"""T5 text encoder for CogVideoX conditioning.

The reference encodes prompts with T5-XXL (4096-d) via transformers and caches the
embeddings (`CogVideo-main/finetune/datasets/i2v_dataset.py:102-124`). Here the encoder is
transformers' Flax T5 (same jax ecosystem — no torch in the loop); pipelines equally accept
precomputed embeddings, so the encoder is only needed at prompt-encoding time.
"""

from __future__ import annotations

import numpy as np


class T5TextEncoder:
    """Thin wrapper over transformers FlaxT5EncoderModel + tokenizer.

    Requires local checkpoint files (no-egress environments pass ``model_path``);
    pad/truncate to ``max_length`` = 226 like CogVideoX."""

    def __init__(self, model_path: str, max_length: int = 226, dtype="bfloat16"):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxT5EncoderModel.from_pretrained(model_path, dtype=dtype)
        self.max_length = max_length

    def encode(self, prompts) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        tokens = self.tokenizer(prompts, padding="max_length", truncation=True,
                                max_length=self.max_length, return_tensors="np")
        out = self.model(input_ids=tokens["input_ids"],
                         attention_mask=tokens["attention_mask"])
        return np.asarray(out.last_hidden_state)
