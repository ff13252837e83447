"""Engine constants mirroring the reference's semantic contract.

Each constant cites the reference file:line it mirrors (parity check only;
the implementation is Spark-native, not a port).
"""

# Valid time domain: [-(16 << 56), 48 << 56) ns ~= years 1933..2079
# (reference: quasar.go:42-43, qtree/qtree_utils.go:31-32).
MIN_TIME: int = -(16 << 56)
MAX_TIME: int = 48 << 56

# Inserts must satisfy MIN_TIME <= t < MAX_TIME - 1 (quasar.go:92).
MAX_INSERT_TIME: int = MAX_TIME - 2

# Tree geometry (semantic only — we do not build a tree). A "pointwidth" pw
# bucket covers 2**pw nanoseconds, aligned to multiples of 2**pw
# (qtree/qtree_utils.go:395-411). ROOT_PW=56 with 64 children spans the domain
# (qtree_utils.go:28-30). KFACTOR=64, PWFACTOR=6, VSIZE=1024
# (internal/bstore/bstore.go:22-27).
ROOT_PW: int = 56
ROOT_START: int = -(1 << 60)
KFACTOR: int = 64
PWFACTOR: int = 6
VSIZE: int = 1024
MAX_PW: int = 62  # quasar.go:277 rejects pw > 63; serve.go:199 caps at 64

# API batch limits (grpcinterface/serve.go:63-68).
MAX_INSERT_BATCH: int = 25_000
RAW_BATCH_SIZE: int = 5_000
STAT_BATCH_SIZE: int = 5_000
CHANGED_RANGE_BATCH_SIZE: int = 1_000
LOOKUP_STREAMS_BATCH_SIZE: int = 200

# Max points sharing one 1-ns timestamp when reference-compat truncation is
# enabled: a pw=0 vector block holds VSIZE=1024 points and the reference
# truncates the overflow on insert (qtree.go:692-699, bstore VSIZE).
DUP_TIMESTAMP_CAP: int = 1024

# Write buffering (pqm.go:35-41).
MAX_BUFFER_POINTS: int = 32_768
MAX_BUFFER_AGE_SECONDS: int = 8 * 3600

# Metadata validation (internal/mprovider/metaprovider.go:24-53).
MAX_TAGS: int = 32
MAX_ANNOTATIONS: int = 64
KEY_REGEX: str = r"^[a-z][a-z0-9_.]*$"
MAX_KEY_LEN: int = 64
MAX_VAL_LEN: int = 256
MAX_COLLECTION_LEN: int = 256
MAX_LIST_COLLECTIONS_LIMIT: int = 10_000

# Error codes mirrored from bte/errors.go:146-270 (the user-facing subset).
ERR_NO_SUCH_POINT = 401
ERR_NO_SUCH_STREAM = 404
ERR_INVALID_TIME_RANGE = 413
ERR_INSERT_TOO_BIG = 414
ERR_BAD_VALUE = 425
ERR_ANN_VERSION_MISMATCH = 429
ERR_INVALID_POINT_WIDTH = 415
ERR_BAD_UUID = 407
ERR_STREAM_EXISTS = 406
ERR_BAD_TAG_KEY = 409
ERR_BAD_TAG_VALUE = 410
ERR_BAD_LIMIT = 411
ERR_RESOURCE_DEPLETED = 419
