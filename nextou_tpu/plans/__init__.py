from nextou_tpu.plans.loader import PlansManager, ConfigurationManager, LabelManager
