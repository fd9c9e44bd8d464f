"""Model branches (reference layer L2: meshreg/models/)."""

from hocon.models.backbone import ResNet, resnet18, resnet50
from hocon.models.hocnet import HOCNet
from hocon.models.losses import hand_losses, object_losses, total_supervised_loss
