"""Runtime control surfaces: settings-applet FIFO protocol, command API."""
