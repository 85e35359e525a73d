from faldoi_tpu.matchers.rescore import confidence_values, score_from_autocorr  # noqa: F401
from faldoi_tpu.matchers.matchlists import (  # noqa: F401
    cut_deep_list,
    cut_matching_list,
    delete_outliers,
    joint_matches,
)
