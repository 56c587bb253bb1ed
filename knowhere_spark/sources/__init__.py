"""Sources/sinks: testdata parquet loaders and the index persistence
layer (the reference's BinarySet serialize/deserialize analog —
include/knowhere/binaryset.h — as Parquet tables + JSON manifest)."""
