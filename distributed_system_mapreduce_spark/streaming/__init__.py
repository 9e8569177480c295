from .cdc import (  # noqa: F401
    cdc_apply_changelog,
    cdc_upsert_stream,
)
from .curation import (  # noqa: F401
    decontam_flagged_stream,
    eval_shingle_table,
)
from .dedup import (  # noqa: F401
    dedup_exact_stream,
    dedup_exact_stream_watermarked,
    minhash_candidates_stream,
    minhash_verified_stream,
    read_documents_stream,
)
from .tws import (  # noqa: F401
    LastKValuesProcessor,
    SessionTimeoutProcessor,
    TwsUnavailable,
    TypeCountsProcessor,
    UserTotalsProcessor,
    UserTotalsTtlProcessor,
    configure_tws,
    lastk_values_tws,
    session_timeout_tws,
    tws_runtime_available,
    type_counts_tws,
    user_totals_tws,
    user_totals_ttl_tws,
)
from .joins import (  # noqa: F401
    asof_attribution_stream,
    theta_range_pairs_stream,
)
from .sketches import (  # noqa: F401
    cms_sketch_stream,
)
from .windows import (  # noqa: F401
    ewma_stream,
    rate_anomaly_stream,
    read_events_stream,
    run_available_now,
    running_user_totals_stream,
    session_counts_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
