# Diverse Weather (S-DGOD) dataset schema: 5 VOC-style domains, Repeat x2
# train on Daytime-Sunny, test on all 5 (reference _base_/datasets/s-dgod.py).
dataset_type = 'SdgodDataset'
data_root = 'data/S-DGOD/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1280, 600), (1280, 720)], keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(2048, 1024),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size_divisor=32),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])
]


def _dom(sub, split):
    return dict(
        type=dataset_type,
        ann_file=data_root + sub + '/VOC2007/ImageSets/Main/' + split + '.txt',
        img_prefix=data_root + sub + '/VOC2007/',
        pipeline=test_pipeline)


data = dict(
    samples_per_gpu=2,
    workers_per_gpu=4,
    train=dict(
        type='RepeatDataset',
        times=2,
        dataset=dict(
            type=dataset_type,
            ann_file=data_root +
            'Daytime_Sunny/daytime_clear/VOC2007/ImageSets/Main/train.txt',
            img_prefix=data_root + 'Daytime_Sunny/daytime_clear/VOC2007/',
            pipeline=train_pipeline)),
    val=_dom('Daytime_Sunny/daytime_clear', 'test'),
    test=[
        _dom('Daytime_Sunny/daytime_clear', 'test'),
        _dom('Daytime-Foggy/daytime_foggy', 'train'),
        _dom('Dusk-rainy/dusk_rainy', 'train'),
        _dom('Night_rainy/night_rainy', 'train'),
        _dom('Night-Sunny/night_sunny', 'train'),
    ])
evaluation = dict(interval=1, metric='mAP')
