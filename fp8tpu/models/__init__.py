"""Model families: MLP, ResNet/VGG/MobileNet (PTQ/QAT workloads),
decoder transformer (flagship serving/training workload), BERT-style
encoder."""

from .mlp import MLP  # noqa: F401
from .vision import (  # noqa: F401
    MOBILENET_EXEMPT,
    VGG_EXEMPT,
    MobileNet,
    MobileNetConfig,
    VGG,
    VGGConfig,
    mobilenet,
    tiny_mobilenet,
    tiny_vgg,
    vgg11,
)
from .resnet import (  # noqa: F401
    RESNET_EXEMPT,
    RESNET_OUTPUT_FUSED,
    ResNet,
    ResNetConfig,
    resnet18,
    resnet50,
    tiny_resnet,
)
from .bert import (  # noqa: F401
    BERT_OUTPUT_FUSED,
    BERT_QA_EXEMPT,
    BertConfig,
    BertEncoder,
    BertForQA,
    tiny_bert,
)
from .transformer import (  # noqa: F401
    Decoder,
    DecoderConfig,
    tiny_config,
)
