from eoe_tpu.models.cnn import CNN28, CNN32  # noqa: F401
from eoe_tpu.models.resnet import WideResNet  # noqa: F401
from eoe_tpu.models.resnet50 import WideResNet50Pretrained  # noqa: F401
from eoe_tpu.models.ae import AE32  # noqa: F401
from eoe_tpu.models.custom_base import CustomNet  # noqa: F401
