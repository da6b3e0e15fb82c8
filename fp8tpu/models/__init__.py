"""Model families: MLP, ResNet/VGG/MobileNet (PTQ/QAT workloads),
decoder transformer (flagship serving/training workload), BERT-style
encoder."""

from .mlp import MLP  # noqa: F401
from .vision import (  # noqa: F401
    DENSENET_EXEMPT,
    INCEPTION_EXEMPT,
    MOBILENET_EXEMPT,
    SHUFFLENET_EXEMPT,
    VGG_EXEMPT,
    DenseNet,
    DenseNetConfig,
    Inception,
    InceptionConfig,
    MobileNet,
    MobileNetConfig,
    ShuffleNet,
    ShuffleNetConfig,
    VGG,
    VGGConfig,
    densenet,
    inception,
    mobilenet,
    shufflenet,
    tiny_densenet,
    tiny_inception,
    tiny_mobilenet,
    tiny_shufflenet,
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
    bert_base_config,
    bert_large_config,
    BertEncoder,
    BertForQA,
    tiny_bert,
)
from .transformer import (  # noqa: F401
    Decoder,
    DecoderConfig,
    tiny_config,
)
