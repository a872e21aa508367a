"""DistilBERT/LoRA/tokenizer oracle — run in a subprocess (torch+jax cannot
share a process here; see tests/conftest.py).

Builds a small random HF DistilBertForSequenceClassification (offline, config
only), wraps it in a PEFT LoRA adapter with the reference recipe (r=8,
alpha=16, targets q_lin/v_lin — Scripts/finetuneDistillBert.ipynb cell 8),
and materializes state dicts + logits. Also emits HF WordPiece tokenizer
outputs from a tiny vocab for tokenizer parity.

Usage: python tests/distilbert_oracle.py OUT.npz VOCAB.txt
"""

import sys

import numpy as np
import torch

from transformers import DistilBertConfig, DistilBertForSequenceClassification
from transformers import DistilBertTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "a", "i", "am", "so", "happy", "sad", "to", "day", "##day",
         "##py", "hap", "terri", "##fied", "love", "music", "and", "of",
         "dark", "this", "is", "it", "!", ".", ",", "?", "'", "don",
         "##'", "##t"]


@torch.no_grad()
def main(out_path, vocab_path):
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB))

    out = {}
    cfg = DistilBertConfig(vocab_size=100, dim=64, n_layers=2, n_heads=4,
                           hidden_dim=128, max_position_embeddings=64,
                           num_labels=28)
    torch.manual_seed(0)
    model = DistilBertForSequenceClassification(cfg).eval()
    for k, v in model.state_dict().items():
        out[f"base::{k}"] = v.numpy()

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (3, 16))
    mask = np.ones((3, 16), np.int64)
    mask[0, 10:] = 0
    mask[2, 5:] = 0
    out["ids"] = ids
    out["mask"] = mask
    out["logits_base"] = model(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask)).logits.numpy()

    # LoRA adapter, reference recipe
    from peft import LoraConfig, get_peft_model
    lcfg = LoraConfig(r=8, lora_alpha=16, lora_dropout=0.0,
                      target_modules=["q_lin", "v_lin"],
                      task_type="SEQ_CLS")
    torch.manual_seed(1)
    peft_model = get_peft_model(model, lcfg).eval()
    # randomize lora_B (peft zero-inits it, which would make LoRA a no-op)
    for name, p in peft_model.named_parameters():
        if "lora_B" in name:
            p.normal_(0, 0.05)
        if "lora_A" in name:
            p.normal_(0, 0.05)
    for k, v in peft_model.state_dict().items():
        out[f"peft::{k}"] = v.numpy()
    out["logits_lora"] = peft_model(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask)).logits.numpy()

    # tokenizer vectors
    tok = DistilBertTokenizer(vocab_file=vocab_path, do_lower_case=True)
    texts = ["I am so happy today!", "terrified of the dark",
             "I love music, and it is happy.", "don't",
             "unknownword happy"]
    for i, t in enumerate(texts):
        enc = tok(t, truncation=True, padding="max_length", max_length=20)
        out[f"tok_ids_{i}"] = np.asarray(enc["input_ids"])
        out[f"tok_mask_{i}"] = np.asarray(enc["attention_mask"])
    out["n_texts"] = np.asarray(len(texts))

    np.savez(out_path, **out)
    print("distilbert oracle written:", out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
