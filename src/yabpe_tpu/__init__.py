"""yabpe-tpu: a TPU-native byte-level BPE framework built on JAX/XLA/Pallas/pjit.

Public API mirrors the surface of the reference library
(``yet_another_bpe``, see /root/reference/src/yet_another_bpe/__init__.py:5-13)
so users can switch over without code changes:

- :class:`BBPETokenizer` — encode/decode with a trained or loaded model.
- :class:`BBPETrainer`   — train a byte-level BPE vocabulary from text files.
- :class:`BBPETrainerConfig` — trainer configuration dataclass.
- :class:`BBPEModel`     — container for a trained model.

The implementation, however, is a fresh TPU-first design: the training inner
loop (pair-count -> argmax-best-pair -> merge-apply) runs as jitted XLA/Pallas
programs over fixed-width padded symbol arrays resident on device, and the
encoder is a vectorized merge-rank scan. See ``yabpe_tpu.train`` and
``yabpe_tpu.tok``.
"""

from yabpe_tpu.utils.jaxsetup import setup_compilation_cache as _setup_cache

_setup_cache()
# NOTE: glibc malloc tuning (yabpe_tpu.utils.hostmem.tune_malloc) is NOT
# applied at import — it mutates process-wide allocator behavior (single
# arena, no trim), which is right for training/benchmark processes but
# wrong to impose on any application that merely imports this library.
# The trainer, warm_heap, and the bench/CLI entry points opt in.

from yabpe_tpu.train.config import BBPETrainerConfig
from yabpe_tpu.train.model import BBPEModel
from yabpe_tpu.train.trainer import BBPETrainer
from yabpe_tpu.tok.tokenizer import BBPETokenizer

__version__ = "0.1.0"

__all__ = [
    "BBPETokenizer",
    "BBPETrainer",
    "BBPETrainerConfig",
    "BBPEModel",
    "__version__",
]
