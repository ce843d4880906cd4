from .losses import weighted_cross_entropy, get_class_weight, adentropy, cross_entropy
from .schedules import cosine_annealing
from .supervised import SupervisedTrainer
from .mme import MMETrainer
