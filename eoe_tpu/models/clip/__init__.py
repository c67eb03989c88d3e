from eoe_tpu.models.clip.model import (  # noqa: F401
    CLIP, ClipConfig, RN50, VIT_B32, quick_gelu)
from eoe_tpu.models.clip.tokenizer import ClipTokenizer, tokenize  # noqa: F401
from eoe_tpu.models.clip.convert import (  # noqa: F401
    config_from_state_dict, load_checkpoint, to_flax)
