from .ssn import SSN, fuse_test_heads
from .binary import BinaryClassifier
from .backbones import get_backbone, InputSpec
from .convert import (convert_torch_backbone_state, convert_torch_ssn_checkpoint,
                      cross_modality_init, load_torch_checkpoint)
