"""User-extensible custom model zoo.

Parity target: /root/reference/src/eoe/models/custom.py — any CustomNet
subclass defined in this module is auto-discovered by the train_only_custom /
inference_custom entry points via inspection (train_only_custom.py:23-26).
"""

import flax.linen as nn

from eoe_tpu.models.custom_base import CustomNet
from eoe_tpu.models.resnet import WideResNet


class WideResNetCustom(CustomNet):
    """WideResNet(+CBAM) feature model behind the CustomNet head."""
    feature_dim: int = 256

    def features(self, x, train: bool = True):
        return WideResNet(rep_dim=self.feature_dim, clf=False,
                          name=self.FEATURE_COLLECTION)(x, train)
