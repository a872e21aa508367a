"""Training stack: pjit trainer, data pipeline, reference presets."""

from .data import (batches, iter_csv_tokens, pad_and_shift, synthetic_corpus,
                   synthetic_song, write_synthetic_csv)
from .trainer import (TrainConfig, Trainer, loss_fn, make_optimizer,
                      make_train_step, reference_preset)

__all__ = ["TrainConfig", "Trainer", "batches", "iter_csv_tokens", "loss_fn",
           "make_optimizer", "make_train_step", "pad_and_shift",
           "reference_preset", "synthetic_corpus", "synthetic_song",
           "write_synthetic_csv"]
