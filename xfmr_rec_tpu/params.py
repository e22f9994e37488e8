"""Framework-wide constants.

Capability parity with the reference constants module
(/root/reference/xfmr_rec/params.py:1-29): dataset paths, column names,
batch size, the model-selection metric and top-k, and serving artifact
names. Values are kept identical where the concept carries over so a
reference user finds the same defaults.
"""

# paths
MOVIELENS_1M_URL = "https://files.grouplens.org/datasets/movielens/ml-1m.zip"
DATA_DIR = "data"
TENSORBOARD_DIR = "tb_logs"
RUNS_DIR = "runs"

# data column names (MovieLens-1M schema)
TARGET_COL = "rating"
ITEM_IDX_COL = "movie_rn"
ITEM_ID_COL = "movie_id"
ITEM_TEXT_COL = "movie_text"
USER_IDX_COL = "user_rn"
USER_ID_COL = "user_id"
USER_TEXT_COL = "user_text"

# model / training
BATCH_SIZE = 2**5
PADDING_IDX = 0
METRIC = {"name": "val/RetrievalNormalizedDCG", "mode": "max"}
TOP_K = 20

# serving artifact layout
ITEMS_TABLE_NAME = "movies"
USERS_TABLE_NAME = "users"
MODEL_NAME = "xfmr_rec_tpu"
INDEX_DIR = "index"
PROCESSORS_JSON = "processors.json"
ENCODER_DIR = "encoder"
