from .ssn import SSN, fuse_test_heads
from .binary import BinaryClassifier
from .backbones import get_backbone, InputSpec
