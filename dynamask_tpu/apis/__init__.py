from .train import train_detector, set_random_seed, get_root_logger
from .test import (single_device_test, multi_device_test, aug_device_test,
                   make_test_fn)
from .inference import (init_detector, inference_detector, show_result,
                        async_inference_detector)

__all__ = [
    'train_detector', 'set_random_seed', 'get_root_logger',
    'single_device_test', 'multi_device_test', 'aug_device_test',
    'make_test_fn',
    'init_detector', 'inference_detector', 'show_result',
    'async_inference_detector',
]
