from .checks import (  # noqa: F401
    assert_in_plan,
    assert_not_in_plan,
    explain_str,
    global_window_violations,
    optimized_tree,
)
from .scan import chunked_running_sum  # noqa: F401
from .topk import salted_topk  # noqa: F401
