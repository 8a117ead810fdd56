"""Application shell: the reference's Runtime layer (main loop, timer, frame
index, input, fly camera, app) in host-side Python around the jitted frame."""
