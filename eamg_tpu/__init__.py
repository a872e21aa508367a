"""EAMG-TPU: emotion-adaptive music generation, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference project RohitMurali18/Music-Generation-Emotion-Adaptive:

- free-form text -> 28-way GoEmotions classification (Flax DistilBERT + LoRA)
- emotion -> music-theory parameters (EATS lookup: BPM, key, scale, families)
- control tokens -> autoregressive symbolic-MIDI transformer (compiled
  lax.while_loop decode with an HBM-resident KV cache, Pallas kernels)
- token stream -> Standard MIDI File -> WAV (on-device JAX additive synth)
- HTTP service exposing the reference's POST /generate contract

Layers (host/device split is explicit):
    eamg_tpu.midi       host  - SMF codec, GM tables, key analysis
    eamg_tpu.tokenizer  host  - Scheme A text tokens / Scheme B compact ids
    eamg_tpu.models     device- Flax GPT family + DistilBERT, quirk-exact
    eamg_tpu.ops        device- Pallas fused attention/FFN/sampling
    eamg_tpu.decode     device- compiled KV-cache sampling runtime
    eamg_tpu.emotion    mixed - classifier + EATS mapping
    eamg_tpu.train      device- pjit trainers (DP mesh, grad accumulation)
    eamg_tpu.parallel   device- mesh + sharding rules
    eamg_tpu.audio      device- MIDI->waveform synthesizer
    eamg_tpu.serve      host  - stdlib HTTP server (POST /generate)
"""

__version__ = "0.1.0"
