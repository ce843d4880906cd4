from .morphology import erode, dilate, morph_open, morph_close
from .labelgen import process_classes, process_classes_batch
from .metrics import (accuracy, dice_score, iou, confusion_matrix,
                      evaluate_outputs, summarize_weighted)
