from .cdc import (  # noqa: F401
    TRANSACTIONS_SCHEMA,
    create_transactions_table,
    good_rows,
    merge_cdc_batch,
    parse_cdc,
    quarantine_rows,
    stream_cdc_to_table,
)
from .tables import (  # noqa: F401
    read_table_stream,
    stream_copy_into,
    stream_table_to_table,
)
