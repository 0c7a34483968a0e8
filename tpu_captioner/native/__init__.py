from tpu_captioner.native.lib import get_lib, native_available
