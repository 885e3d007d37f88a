from .tester import Tester
from .serving import build_serving_forward
from .export import export_serving, load_serving
from .reporting import (
    Myreport,
    plot_progress,
    plot_confusion_matrix,
    plot_subject_accuracies,
    history2df,
    save_history,
)

__all__ = [
    "Tester",
    "build_serving_forward",
    "export_serving",
    "load_serving",
    "Myreport",
    "plot_progress",
    "plot_confusion_matrix",
    "plot_subject_accuracies",
    "history2df",
    "save_history",
]
