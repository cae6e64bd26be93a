optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001,
                 grad_clip=dict(max_norm=35))
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[8, 11], gamma=0.1)
