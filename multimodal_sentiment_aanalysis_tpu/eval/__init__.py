from .tester import Tester
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
    "Myreport",
    "plot_progress",
    "plot_confusion_matrix",
    "plot_subject_accuracies",
    "history2df",
    "save_history",
]
