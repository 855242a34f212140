from rrnet_tpu.evallib.metrics import (  # noqa: F401
    evaluate_once,
    evaluate_results,
    auto_evaluate_results,
)
from rrnet_tpu.evallib.writer import save_result, load_result  # noqa: F401
