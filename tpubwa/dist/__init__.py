from .sharding import (DataParallel, byte_range_shards, fastq_shard_reader,
                       merge_shard_files, plan_shards)

__all__ = ["DataParallel", "byte_range_shards", "fastq_shard_reader",
           "merge_shard_files", "plan_shards"]
