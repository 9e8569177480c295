from .checks import assert_in_plan, assert_not_in_plan, explain_str  # noqa: F401
from .scan import chunked_running_sum  # noqa: F401
from .topk import salted_topk  # noqa: F401
