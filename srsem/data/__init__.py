"""Host-side data pipeline: decode, index readers, batching, prefetch.

Replaces the reference's ``torch.utils.data.Dataset`` + ``DataLoader``
stack (reference: datasets/global_eval_torch_ds.py,
datasets/local_eval_torch_ds.py) with plain-Python index readers, a
thread-pool decode/prefetch loader, and device-side normalization fused into
the jitted step.  Same sample contract: ``((img_a, img_b), label)``.
"""

from srsem.data.preprocess import Preprocess, decode_image  # noqa: F401
from srsem.data.datasets import (  # noqa: F401
    ImpaintMapsDataset,
    KoniqPairsMapsDataset,
    UserStudyScores,
)
from srsem.data.loader import Loader, pad_batch  # noqa: F401
