from tpu_captioner.data.vocab import build_word_map, encode_caption, load_word_map
from tpu_captioner.data.build import create_input_files
from tpu_captioner.data.dataset import CaptionDataset, Batch, EvalBatch
from tpu_captioner.data.loader import ShardedLoader, prefetch_to_device
