"""Host data layer: ingest, tokenization, feature stores, batching."""

from multimodal_classification_tpu.data.features import (  # noqa: F401
    DictFeatureStore,
    FeatureStore,
    HDF5FeatureStore,
    write_hdf5_features,
)
from multimodal_classification_tpu.data.loader import (  # noqa: F401
    BatchLoader,
    MemesDataset,
    make_loaders,
)
from multimodal_classification_tpu.data.memes import (  # noqa: F401
    attach_image_paths,
    compute_dataset_statistics,
    create_train_val_split,
    load_hateful_memes,
    load_jsonl,
    preprocess_data,
)
from multimodal_classification_tpu.data.tokenizer import (  # noqa: F401
    WordPieceTokenizer,
    build_test_vocab,
    load_tokenizer,
)
