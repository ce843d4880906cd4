from .tiramisu import (FCDenseNet, FCDenseNetFeatureExtractor, FCDenseNetClassifier,
                       fcdensenet57, fcdensenet67, fcdensenet103,
                       fcdensenet57_base_classifier, fcdensenet67_base_classifier,
                       grad_reverse)
from .encdec import EncDecNet
from .cyclegan import GeneratorResNet
