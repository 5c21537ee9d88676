from .analysis import (make_feature_step, single_gpu_analyze_feature,
                       single_gpu_test_feature)
from .inference import (DetectorHandle, async_inference_detector,
                        inference_detector, init_detector,
                        show_result_pyplot)
from .test import multi_gpu_test, run_test, single_gpu_test
from .train import init_random_seed, set_random_seed, train_detector
