# OA-DG Cityscapes schedule (reference configs/_base_/schedules/oadg.py):
# 1 runner epoch over RepeatDataset(8) at lr 0.01, decay at repeat-epoch 7.
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[7])
runner = dict(type='EpochBasedRunner', max_epochs=1)
