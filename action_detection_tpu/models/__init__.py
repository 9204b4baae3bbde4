from .ssn import SSN, fuse_test_heads
from .binary import BinaryClassifier
from .backbones import get_backbone, InputSpec
from .convert import (convert_torch_backbone_state, convert_torch_ssn_checkpoint,
                      cross_modality_init, load_torch_checkpoint)


def jitted_init(model, rngs, *args, **kwargs):
    """``model.init`` under one ``jax.jit`` trace.

    Eager flax init dispatches every layer op separately; on a remote-compile
    stack (the axon tunnel) that is hundreds of round-trips — measured ~240s
    for BNInception vs one jitted compile. Keyword args are closed over as
    static (e.g. ``train=False``).
    """
    import jax

    return jax.jit(lambda r, *a: model.init(r, *a, **kwargs))(rngs, *args)
