from .cdc import (  # noqa: F401
    TRANSACTIONS_SCHEMA,
    create_transactions_table,
    good_rows,
    merge_cdc_batch,
    parse_cdc,
    quarantine_rows,
    stream_cdc_to_table,
)
