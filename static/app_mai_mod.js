/* MaiMod page: run a teacher-forced analysis job, stream logs, render the
   suggestion table with osu://edit links (reference: mai_mod_ui.py). */
(function () {
  const $ = (id) => document.getElementById(id);
  const form = $("maimod-form");
  const log = $("log");
  const table = $("results");
  const tbody = table.querySelector("tbody");
  const analyzeBtn = $("analyze-btn");
  const cancelBtn = $("cancel-btn");
  let jobId = null;
  let source = null;

  function append(line, cls) {
    const span = document.createElement("span");
    if (cls) span.className = cls;
    span.textContent = line + "\n";
    log.appendChild(span);
    log.scrollTop = log.scrollHeight;
  }

  async function populateModels() {
    const res = await fetch("/models");
    const names = res.ok ? await res.json() : ["v32"];
    const sel = $("model-select");
    sel.innerHTML = "";
    for (const n of names) {
      const opt = document.createElement("option");
      opt.value = n; opt.textContent = n;
      sel.appendChild(opt);
    }
    if (names.includes("v31")) sel.value = "v31";
  }

  function addRow(s) {
    const tr = document.createElement("tr");
    tr.className = "cat-" + (s.category || "Other");
    const time = document.createElement("td");
    time.className = "time";
    const a = document.createElement("a");
    a.href = s.edit_link || "#";
    a.textContent = s.timestamp || "";
    time.appendChild(a);
    const cat = document.createElement("td");
    cat.textContent = s.category || "";
    const sur = document.createElement("td");
    sur.textContent = (s.surprisal != null) ? s.surprisal.toFixed(1) : "";
    const msg = document.createElement("td");
    msg.textContent = s.message || "";
    tr.append(time, cat, sur, msg);
    tbody.appendChild(tr);
  }

  function setRunning(running) {
    analyzeBtn.disabled = running;
    cancelBtn.disabled = !running;
  }

  form.addEventListener("submit", async (e) => {
    e.preventDefault();
    log.textContent = "";
    tbody.innerHTML = "";
    table.hidden = true;
    setRunning(true);
    const res = await fetch("/start_mai_mod", { method: "POST", body: new URLSearchParams(new FormData(form)) });
    const out = await res.json();
    if (out.status !== "success") {
      append("error: " + (out.message || "unknown"), "err");
      setRunning(false);
      return;
    }
    jobId = out.job_id;
    if (source) source.close();
    source = new EventSource(`/stream_output?job_id=${jobId}`);
    source.onmessage = (ev) => {
      if (ev.data === "__DONE__") {
        source.close(); setRunning(false);
      } else if (ev.data.startsWith("__ERROR__")) {
        append(ev.data.slice(9), "err"); source.close(); setRunning(false);
      } else if (ev.data.startsWith("__SUGGESTION__")) {
        try { addRow(JSON.parse(ev.data.slice(14))); table.hidden = false; } catch (err) {}
      } else {
        append(ev.data);
      }
    };
    source.onerror = () => { source.close(); setRunning(false); };
  });

  cancelBtn.addEventListener("click", async () => {
    if (!jobId) return;
    const body = new FormData();
    body.append("job_id", jobId);
    await fetch("/cancel_inference", { method: "POST", body: new URLSearchParams(body) });
    setRunning(false);
    if (source) source.close();
  });

  populateModels();
})();
