from .partitioned import (  # noqa: F401
    list_complete_partitions,
    read_partitioned,
    write_partitioned,
)
