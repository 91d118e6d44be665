"""Pseudo-label generation: caption parsing, pair enumeration, batched
C2C/C2I cosine scoring, VLM adapter contracts.

Rebuilds ``datasets/SRdatasetPseudolabelGen/`` (reference) as a framework:
the post-VLM math (embedding, cosine, pairing, file formats) is native JAX;
the 7B VLMs themselves (Qwen2-VL, ViP-LLaVA, OneFormer) are pluggable
adapter backends with exact I/O contracts (SURVEY.md §7 step 7).
"""

from srsem.pseudo.captions import (  # noqa: F401
    enumerate_pairs,
    parse_caption_file,
    write_caption_file,
)
from srsem.pseudo.scoring import cosine_similarity_matrix, score_caption_pairs  # noqa: F401
