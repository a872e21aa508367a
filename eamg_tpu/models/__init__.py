"""Device-side models: the GPT decoder family and DistilBERT classifier."""

from .gpt import (GPTConfig, attention, count_params, decode_block,
                  decode_step, forward, forward_masked, init_kv_cache,
                  init_params, prefill, preset)
from .import_torch import (export_state_dict, import_state_dict,
                           infer_geometry, load_reference_checkpoint,
                           remap_kv_dialect)
from .quant import quantize_params

__all__ = [
    "GPTConfig", "attention", "count_params", "decode_block", "decode_step",
    "export_state_dict", "forward", "forward_masked", "import_state_dict",
    "infer_geometry",
    "init_kv_cache", "init_params", "load_reference_checkpoint", "prefill",
    "preset", "quantize_params", "remap_kv_dialect",
]
