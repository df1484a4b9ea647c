from visitron_tpu.evaluation.metrics import Evaluator, ndtw, cls_metric
from visitron_tpu.evaluation.classifier_metrics import binary_classification_metrics

__all__ = ["Evaluator", "ndtw", "cls_metric", "binary_classification_metrics"]
