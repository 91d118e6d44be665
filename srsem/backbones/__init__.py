"""Feature-pyramid backbones.

The reference taps intermediate activations of timm backbones with forward
hooks filling a mutable ``self.outputs`` dict
(reference: models/global_eval_models.py:82-100,399-417).  TPU-native
equivalent: pure multi-output ``apply`` — every backbone returns
``(embedding, taps)`` where ``taps`` maps the reference's hook names verbatim
("stem.conv3", "stages.0.2.act", "conv1", "layer1.2.act3", "blocks.11.ls2")
to NHWC feature arrays.  Heads select the taps they need; XLA dead-code
eliminates the rest under jit.
"""

from srsem.backbones.resnet import (  # noqa: F401
    CLIP_STAGE_TAPS,
    CLIP_STEM_TAP,
    IMAGENET_STAGE_TAPS,
    IMAGENET_STEM_TAP,
    ClipResNet50,
    ImageNetResNet50,
    make_backbone,
)
from srsem.backbones.vit import ClipViT, vit_block_taps  # noqa: F401
